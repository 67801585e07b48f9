"""Is XLA scatter-add priced per-INDEX or per-ELEMENT on this stack?

Slope protocol (fori_loop chained inside one jit, host round-trip once) —
the only honest timing on this relay (block_until_ready does not block,
repeated identical executions are cached).

The exact-march backward is scatter-bound.  Row-GATHER is priced per-index
(slope_results.jsonl: row_take_W8 ~= scalar take per index).  If row-SCATTER
is too, accumulating the volume grad as (N, 8) rows into the (C, 8) cell
grad table (custom_vjp) instead of 8N scalars cuts the backward ~8x.

Appends JSON to experiments/row_scatter_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "row_scatter_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def timed_host(f, *args, reps=2):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(reps):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / reps


def slope(make_f, args, K1=1, K2=4):
    tA = timed_host(make_f(K1), *args)
    tB = timed_host(make_f(K2), *args)
    return (tB - tA) / (K2 - K1), tA, tB


M = 1 << 23          # 8.4M indices
C = 1 << 21          # 2M rows
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (M,), 0, C, jnp.int32)
up8 = jax.random.uniform(key, (M, 8), jnp.float32)
idxe = jax.random.randint(key, (M * 8,), 0, C * 8, jnp.int32)
upe = jax.random.uniform(key, (M * 8,), jnp.float32)
print("devices:", jax.devices(), flush=True)

# ---- 1. element scatter-add: 67M scalar updates into (16.7M,) ----
def mk_elem(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % (C * 8)
            out = jnp.zeros((C * 8,), jnp.float32).at[i].add(uu)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f

s, tA, tB = slope(mk_elem, (idxe, upe))
log(exp="elem_scatter", n_elem=M * 8, per_op_s=round(s, 5),
    ns_per_elem=round(s / (M * 8) * 1e9, 3), tA=round(tA, 4), tB=round(tB, 4))

# ---- 2. row scatter-add W=8: 8.4M row updates into (2M, 8) ----
def mk_row8(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % C
            out = jnp.zeros((C, 8), jnp.float32).at[i].add(uu)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f

s, tA, tB = slope(mk_row8, (idx, up8))
log(exp="row8_scatter", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3),
    ns_per_elem=round(s / (M * 8) * 1e9, 3), tA=round(tA, 4), tB=round(tB, 4))

# ---- 3. same but into a FLAT (C*8,) table via 1D window updates --------
# (the march's cell table is stored flat; scatter rows as (M, 8) windows
# at stride-8 starts using scatter dimension_numbers through .at on a
# reshaped view)
def mk_row8_flat(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % C
            out = jnp.zeros((C, 8), jnp.float32).at[i].add(uu).reshape(-1)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f

s, tA, tB = slope(mk_row8_flat, (idx, up8))
log(exp="row8_scatter_flatout", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3), tA=round(tA, 4), tB=round(tB, 4))

# ---- 4. anchor: the SAME indices as a row gather (known per-index) -----
table8 = jax.random.uniform(key, (C, 8), jnp.float32)

def mk_gather(K):
    @jax.jit
    def f(c, tt, ii):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % C
            return c + jnp.take(tt, i, axis=0).sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f

s, tA, tB = slope(mk_gather, (table8, idx))
log(exp="row8_gather_anchor", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3), tA=round(tA, 4), tB=round(tB, 4))
