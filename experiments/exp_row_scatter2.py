"""Scatter pricing round 2: does locality / sortedness / table size help?

Variants (slope protocol, see exp_row_scatter.py):
  row8_sorted        — globally sorted indices (best-case locality)
  row8_sorted_hint   — + lax.scatter indices_are_sorted=True
  row8_small_table   — C = 16K rows (64 KB table: cache/VMEM-resident?)
  row8_bf16          — bf16 updates (half the bytes)
  segsum_sorted      — jax.ops.segment_sum with sorted ids
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
    return (tB - tA) / (K2 - K1)


M = 1 << 23
C = 1 << 21
key = jax.random.PRNGKey(0)
idx_sorted = jnp.sort(jax.random.randint(key, (M,), 0, C - 8, jnp.int32))
up8 = jax.random.uniform(key, (M, 8), jnp.float32)
print("devices:", jax.devices(), flush=True)


def mk_row8_sorted(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = ii + (c + k).astype(jnp.int32) % 8      # keep sortedness
            out = jnp.zeros((C, 8), jnp.float32).at[i].add(uu)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_row8_sorted, (idx_sorted, up8))
log(exp="row8_scatter_sorted", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3))


def mk_row8_hint(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = ii + (c + k).astype(jnp.int32) % 8
            out = jnp.zeros((C, 8), jnp.float32).at[i].add(
                uu, indices_are_sorted=True)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_row8_hint, (idx_sorted, up8))
log(exp="row8_scatter_sorted_hint", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3))

CS = 1 << 14
idx_small = jax.random.randint(key, (M,), 0, CS, jnp.int32)


def mk_row8_small(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % CS
            out = jnp.zeros((CS, 8), jnp.float32).at[i].add(uu)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_row8_small, (idx_small, up8))
log(exp="row8_scatter_small_table", n_idx=M, C=CS, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3))

up8h = up8.astype(jnp.bfloat16)


def mk_row8_bf16(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % C
            out = jnp.zeros((C, 8), jnp.bfloat16).at[i].add(uu)
            return c + out.sum().astype(jnp.float32) * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_row8_bf16, (idx_sorted, up8h))
log(exp="row8_scatter_bf16", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3))


def mk_segsum(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = ii + (c + k).astype(jnp.int32) % 8
            out = jax.ops.segment_sum(uu, i, num_segments=C,
                                      indices_are_sorted=True)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_segsum, (idx_sorted, up8))
log(exp="segment_sum_sorted", n_idx=M, per_op_s=round(s, 5),
    ns_per_idx=round(s / M * 1e9, 3))
