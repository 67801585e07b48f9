"""TPU: is gather cost per-INDEX or per-ELEMENT?

If per-index, a (X*Y*Z, 8) cell table (all 8 trilinear corners as one row)
cuts the exact march's index count 8x.  Sweeps take-row width, tests the
cell-gather block, complex64 packing, one-hot-MXU TF lookup, and the
scatter transpose.  All arrays passed as jit ARGUMENTS (closure constants
get embedded into the remote-compile POST: 413 above ~100 MB).

Appends JSON lines to experiments/row_gather_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "row_gather_results.jsonl")

import jax                    # noqa: E402
import jax.numpy as jnp       # noqa: E402
import numpy as np            # noqa: E402


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def chain(f, *args, n=2):
    c = f(jnp.float32(0.0), *args)
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n):
        c = f(c, *args)
    jax.block_until_ready(c)
    return (time.time() - t0) / n


M = 1 << 24          # 16.8M indices (one 64-step block of a 512^2 march)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, 1 << 21, jnp.int32)

    # --- 1. row-width sweep ------------------------------------------
    for W in (1, 2, 4, 8, 16):
        table = jax.random.uniform(key, (1 << 21, W), jnp.float32)

        @jax.jit
        def f(c, table, idx):
            i = (idx + c.astype(jnp.int32)) % (1 << 21)
            v = jnp.take(table, i, axis=0)          # (M, W)
            return c + 1 + v.sum() * 0

        try:
            s = chain(f, table, idx)
            log({"exp": "row", "W": W, "M": M, "s": round(s, 5),
                 "g_idx_per_s": round(M / s / 1e9, 4),
                 "g_elem_per_s": round(M * W / s / 1e9, 4)})
        except Exception as e:
            log({"exp": "row", "W": W, "error": repr(e)[:200]})
            return

    # --- 1b. row gather with TRANSPOSED output layout (8, M) ----------
    table = jax.random.uniform(key, (1 << 21, 8), jnp.float32)

    @jax.jit
    def f_t(c, table, idx):
        i = (idx + c.astype(jnp.int32)) % (1 << 21)
        v = jnp.take(table.T, i, axis=1)            # (8, M)
        return c + 1 + v.sum() * 0

    try:
        s = chain(f_t, table, idx)
        log({"exp": "row_T", "W": 8, "M": M, "s": round(s, 5),
             "g_idx_per_s": round(M / s / 1e9, 4)})
    except Exception as e:
        log({"exp": "row_T", "error": repr(e)[:200]})

    # --- 2. complex64 packing ----------------------------------------
    ctab = (jax.random.uniform(key, (1 << 21,), jnp.float32)
            + 1j * jax.random.uniform(key, (1 << 21,), jnp.float32)
            ).astype(jnp.complex64)

    @jax.jit
    def f_c(c, ctab, idx):
        i = (idx + c.astype(jnp.int32)) % (1 << 21)
        v = jnp.take(ctab, i, axis=0)
        return c + 1 + v.real.sum() * 0

    try:
        s = chain(f_c, ctab, idx)
        log({"exp": "complex64", "M": M, "s": round(s, 5),
             "g_idx_per_s": round(M / s / 1e9, 4)})
    except Exception as e:
        log({"exp": "complex64", "error": repr(e)[:200]})

    # --- 3. one-hot MXU "gather" from a small (128, 8) TF table -------
    tf8 = jax.random.uniform(key, (128, 8), jnp.float32)
    tidx = jax.random.uniform(key, (M,), jnp.float32) * 127.0

    @jax.jit
    def f_oh(c, tf8, tidx):
        t = tidx + c * 1e-6
        x = t.reshape(-1, 512)                       # (M/512, 512)
        cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 128), 2)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - cols))  # hat
        v = jax.lax.dot_general(
            w.astype(jnp.bfloat16), tf8.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (M/512, 512, 8)
        return c + 1 + v.sum() * 0

    try:
        s = chain(f_oh, tf8, tidx)
        log({"exp": "onehot_tf", "M": M, "s": round(s, 5),
             "g_lookups_per_s": round(M / s / 1e9, 4)})
    except Exception as e:
        log({"exp": "onehot_tf", "error": repr(e)[:300]})

    # --- 4. scatter-add transpose of the row gather -------------------
    @jax.jit
    def f_sc(c, table, idx):
        i = (idx + c.astype(jnp.int32)) % (1 << 21)

        def loss(tb):
            return jnp.take(tb, i, axis=0).sum()

        g = jax.grad(loss)(table)                    # row scatter-add
        return c + 1 + g.sum() * 0

    try:
        s = chain(f_sc, table, idx)
        log({"exp": "row_scatter", "W": 8, "M": M, "s": round(s, 5),
             "g_idx_per_s": round(M / s / 1e9, 4)})
    except Exception as e:
        log({"exp": "row_scatter", "error": repr(e)[:200]})

    # --- 5. cell-table march block: gather + trilinear combine --------
    X = Y = Z = 256
    cell = jax.random.uniform(key, (X * Y * Z, 8), jnp.float32)
    fx = jax.random.uniform(key, (M,), jnp.float32)
    fy = jax.random.uniform(key, (M,), jnp.float32)
    fz = jax.random.uniform(key, (M,), jnp.float32)
    cidx = jax.random.randint(key, (M,), 0, X * Y * Z, jnp.int32)

    @jax.jit
    def f_cell(c, cell, cidx, fx, fy, fz):
        i = (cidx + c.astype(jnp.int32)) % (X * Y * Z)
        v = jnp.take(cell, i, axis=0)                # (M, 8)
        wx = jnp.stack([1 - fx, fx], 1)              # (M, 2) ... combine
        # trilinear combine in (M, 8) layout: weight per corner
        w = (jnp.concatenate([1 - fx[:, None], fx[:, None]], 1)[:, [0, 1, 0, 1, 0, 1, 0, 1]]
             * jnp.concatenate([1 - fy[:, None], fy[:, None]], 1)[:, [0, 0, 1, 1, 0, 0, 1, 1]]
             * jnp.concatenate([1 - fz[:, None], fz[:, None]], 1)[:, [0, 0, 0, 0, 1, 1, 1, 1]])
        out = jnp.sum(v * w, axis=1)
        return c + 1 + out.sum() * 0 + wx.sum() * 0

    try:
        s = chain(f_cell, cell, cidx, fx, fy, fz)
        log({"exp": "cell_block", "M": M, "s": round(s, 5),
             "g_samples_per_s": round(M / s / 1e9, 4)})
    except Exception as e:
        log({"exp": "cell_block", "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
