"""Row-gather sweep, take 2: output DEPENDS on gathered values (sum * 1e-20
added to the carry) and the table is perturbed by the carry, so the relay
cannot short-circuit.  Appends to experiments/row_gather_results.jsonl."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "row_gather_results.jsonl")
import jax, jax.numpy as jnp, numpy as np

def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f: f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)

def chain(f, *args, n=2):
    c = f(jnp.float32(0.0), *args); jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n): c = f(c, *args)
    jax.block_until_ready(c)
    return (time.time() - t0) / n

M = 1 << 24
def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, 1 << 21, jnp.int32)
    for W in (1, 4, 8, 16):
        table = jax.random.uniform(key, (1 << 21, W), jnp.float32)
        @jax.jit
        def f(c, table, idx):
            i = (idx + c.astype(jnp.int32)) % (1 << 21)
            v = jnp.take(table + c * 1e-9, i, axis=0)
            return c + 1 + v.sum() * 1e-20
        try:
            s = chain(f, table, idx)
            log({"exp": "row2", "W": W, "M": M, "s": round(s, 5),
                 "g_idx_per_s": round(M / s / 1e9, 4)})
        except Exception as e:
            log({"exp": "row2", "W": W, "error": repr(e)[:200]}); return

    # scalar take from the big flat table, result-dependent (control for
    # the exp_gather_profile numbers which used sum()*0)
    flat = jax.random.uniform(key, (1 << 24,), jnp.float32)
    for n_idx in (1 << 20, 1 << 24):
        idx2 = jax.random.randint(key, (n_idx,), 0, 1 << 24, jnp.int32)
        @jax.jit
        def g(c, flat, idx2):
            i = (idx2 + c.astype(jnp.int32)) % (1 << 24)
            v = jnp.take(flat + c * 1e-9, i, axis=0)
            return c + 1 + v.sum() * 1e-20
        try:
            s = chain(g, flat, idx2)
            log({"exp": "flat2", "n": n_idx, "s": round(s, 5),
                 "g_idx_per_s": round(n_idx / s / 1e9, 4)})
        except Exception as e:
            log({"exp": "flat2", "n": n_idx, "error": repr(e)[:200]}); return

    # cell-block, result-dependent
    X = Y = Z = 256
    cell = jax.random.uniform(key, (X * Y * Z, 8), jnp.float32)
    fx, fy, fz = (jax.random.uniform(jax.random.PRNGKey(i), (M,), jnp.float32) for i in range(3))
    cidx = jax.random.randint(key, (M,), 0, X * Y * Z, jnp.int32)
    @jax.jit
    def h(c, cell, cidx, fx, fy, fz):
        i = (cidx + c.astype(jnp.int32)) % (X * Y * Z)
        v = jnp.take(cell + c * 1e-9, i, axis=0)
        w = (jnp.concatenate([1 - fx[:, None], fx[:, None]], 1)[:, [0,1,0,1,0,1,0,1]]
             * jnp.concatenate([1 - fy[:, None], fy[:, None]], 1)[:, [0,0,1,1,0,0,1,1]]
             * jnp.concatenate([1 - fz[:, None], fz[:, None]], 1)[:, [0,0,0,0,1,1,1,1]])
        return c + 1 + jnp.sum(v * w) * 1e-20
    try:
        s = chain(h, cell, cidx, fx, fy, fz)
        log({"exp": "cell2", "M": M, "s": round(s, 5),
             "g_samples_per_s": round(M / s / 1e9, 4)})
    except Exception as e:
        log({"exp": "cell2", "error": repr(e)[:300]})

if __name__ == "__main__":
    main()
