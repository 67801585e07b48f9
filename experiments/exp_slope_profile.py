"""Slope-protocol profiling: per-op device time = d(total)/dK with K ops
chained inside ONE jit (fori_loop), host round-trip once.  Immune to both
relay result-caching and the non-blocking block_until_ready."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "slope_results.jsonl")
import jax, jax.numpy as jnp, numpy as np

def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f: f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

def timed_host(f, *args, reps=2):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))  # warm + sync
    t0 = time.time()
    for _ in range(reps):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / reps

def slope(make_f, args, K1=2, K2=8):
    tA = timed_host(make_f(K1), *args)
    tB = timed_host(make_f(K2), *args)
    return (tB - tA) / (K2 - K1), tA, tB

M = 1 << 24
key = jax.random.PRNGKey(0)
print("devices:", jax.devices(), flush=True)

# ---- 1. scalar take: 16.8M idx from 16.7M-entry flat table ----
flat = jax.random.uniform(key, (1 << 24,), jnp.float32)
idxf = jax.random.randint(key, (M,), 0, 1 << 24, jnp.int32)
def mk_scalar(K):
    @jax.jit
    def f(c, flat, idxf):
        def body(k, c):
            i = (idxf + (c + k).astype(jnp.int32)) % (1 << 24)
            return c + jnp.take(flat, i, axis=0).sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f
s, tA, tB = slope(mk_scalar, (flat, idxf))
log(exp="scalar_take", M=M, per_op_s=round(s, 5), g_idx_per_s=round(M/s/1e9, 3), tA=round(tA,4), tB=round(tB,4))

# ---- 2. row take W=8: 16.8M idx from (2M, 8) table ----
table8 = jax.random.uniform(key, (1 << 21, 8), jnp.float32)
idx8 = jax.random.randint(key, (M,), 0, 1 << 21, jnp.int32)
def mk_row(K):
    @jax.jit
    def f(c, table8, idx8):
        def body(k, c):
            i = (idx8 + (c + k).astype(jnp.int32)) % (1 << 21)
            return c + jnp.take(table8, i, axis=0).sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f
s, tA, tB = slope(mk_row, (table8, idx8))
log(exp="row_take_W8", M=M, per_op_s=round(s, 5), g_idx_per_s=round(M/s/1e9, 3), tA=round(tA,4), tB=round(tB,4))

# ---- 3. cell-table trilinear block: 16.8M samples from (16.7M, 8) ----
cell = jax.random.uniform(key, (1 << 24, 8), jnp.float32)
cidx = jax.random.randint(key, (M,), 0, 1 << 24, jnp.int32)
fx, fy, fz = (jax.random.uniform(jax.random.PRNGKey(i), (M,), jnp.float32) for i in range(3))
def mk_cell(K):
    @jax.jit
    def f(c, cell, cidx, fx, fy, fz):
        def body(k, c):
            i = (cidx + (c + k).astype(jnp.int32)) % (1 << 24)
            v = jnp.take(cell, i, axis=0)
            w = (jnp.concatenate([1-fx[:,None], fx[:,None]],1)[:, [0,1,0,1,0,1,0,1]]
                 * jnp.concatenate([1-fy[:,None], fy[:,None]],1)[:, [0,0,1,1,0,0,1,1]]
                 * jnp.concatenate([1-fz[:,None], fz[:,None]],1)[:, [0,0,0,0,1,1,1,1]])
            return c + jnp.sum(v * w) * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f
s, tA, tB = slope(mk_cell, (cell, cidx, fx, fy, fz))
log(exp="cell_trilinear", M=M, per_op_s=round(s, 5), g_samples_per_s=round(M/s/1e9, 3), tA=round(tA,4), tB=round(tB,4))

# ---- 4. (8, M) SoA-style gather: 134M scalar idx (current march block) ----
def mk_soa(K):
    @jax.jit
    def f(c, flat, idxf):
        def body(k, c):
            i8 = (idxf[None] + (c.astype(jnp.int32) + k)
                  + jnp.arange(8, dtype=jnp.int32)[:, None]) % (1 << 24)
            return c + jnp.take(flat, i8.reshape(-1), axis=0).sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f
s, tA, tB = slope(mk_soa, (flat, idxf), K1=1, K2=4)
log(exp="soa_8xM_take", n_idx=8*M, per_op_s=round(s, 5), g_idx_per_s=round(8*M/s/1e9, 3), tA=round(tA,4), tB=round(tB,4))

# ---- 5. matmul anchor ----
A = jax.random.uniform(key, (8192, 8192), jnp.float32)
def mk_mm(K):
    @jax.jit
    def f(c, A):
        def body(k, c):
            B = A + c * 1e-12
            return c + jnp.sum(B @ B) * 1e-30 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f
s, tA, tB = slope(mk_mm, (A,))
log(exp="matmul8k_f32", flops=2*8192**3, per_op_s=round(s, 5), tflops=round(2*8192**3/s/1e12, 2), tA=round(tA,4), tB=round(tB,4))
