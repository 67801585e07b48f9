"""Round-4 candidate: sorted-window box scatter for the parity backward.

exp_r4_scatter.py established: scatter pricing is ALLOCATION-bound with a
sharp cliff at 64 MB (14 ns/row below, ~190 above); the ds->scatter->dus
box pattern keeps small-table pricing (15.2 ns/row).  A full-image march
block's base footprint (~335 MB) exceeds any one box, so the candidate
backward sorts the block's rows by base index and processes fixed-size row
windows (sorted => each window's bases span a narrow contiguous table
range) against dynamically-anchored boxes.  This experiment prices the
ingredients and the assembled per-block pattern:

  sort_kv     — lax.sort_key_val of M int32 keys + s32 payload
  reorder     — gather-reorder of (M, 64) rows by a permutation
  win_chain   — W sequential ds->scatter->dus window ops (dispatch cost)
  full_block  — sort + reorder + 8-window box scatter, one jit:
                the complete candidate per-block backward placement cost
                (vs ~M * 190 ns for the current big-table scatter)

Appends to experiments/r4_scatter_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_scatter_results.jsonl")

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


M = 1 << 20                        # rows per march block (headline: ~1M)
C = 1 << 24                        # 16.7M table rows (256^3)
key = jax.random.PRNGKey(0)
rows = jax.random.uniform(key, (M, 64), jnp.float32)
# Block-realistic bases: a ~20-plane shell of the volume (256^3, x-major
# flat index) with per-row jitter — what one march block actually touches.
shell0 = jax.random.randint(key, (M,), 0, 20 * 256 * 256, jnp.int32)
print("devices:", jax.devices(), flush=True)

# --- 1. sort pricing ------------------------------------------------------
for MM in (1 << 20, 1 << 22):
    keys_r = jax.random.randint(key, (MM,), 0, C, jnp.int32)
    pay = jnp.arange(MM, dtype=jnp.int32)

    def mk_sort(K):
        @jax.jit
        def f(c, kk, pp):
            def body(k, c):
                ks, ps = jax.lax.sort_key_val(kk + k.astype(jnp.int32)
                                              + c.astype(jnp.int32), pp)
                return c + (ks[0] + ps[0]).astype(jnp.float32) * 1e-20 + 1e-6
            return jax.lax.fori_loop(0, K, body, c)
        return f

    s = slope(mk_sort, (keys_r, pay))
    log(exp="r4_sort_kv", M=MM, per_op_s=round(s, 5),
        ns_per_key=round(s / MM * 1e9, 3))

# --- 2. permutation reorder of (M, 64) rows -------------------------------
perm = jax.random.permutation(jax.random.PRNGKey(1), M).astype(jnp.int32)


def mk_reorder(K):
    @jax.jit
    def f(c, pp, rr):
        def body(k, c):
            out = jnp.take(rr, (pp + k.astype(jnp.int32)) % M, axis=0)
            return c + out[0, 0] * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_reorder, (perm, rows))
log(exp="r4_reorder_rows", M=M, per_op_s=round(s, 5),
    ns_per_row=round(s / M * 1e9, 3))

# --- 3. the assembled per-block pattern -----------------------------------
# sort bases -> reorder rows -> 8 windows of M/8 rows, each scattered into
# a 256K-row (64 MB) box anchored at the window's first base, dus'd back.
NW = 8
WR = M // NW                       # rows per window
E = 1 << 18                        # box extent: 262144 rows = 64 MB


def mk_full(K):
    @jax.jit
    def f(c, bb, rr):
        d_tab = jnp.zeros((C, 64), jnp.float32)

        def body(k, carry):
            c, d_tab = carry
            b = (bb + k.astype(jnp.int32) * 4096 + c.astype(jnp.int32)) % (C - E)
            bs, pidx = jax.lax.sort_key_val(b, jnp.arange(M, dtype=jnp.int32))
            rs = jnp.take(rr, pidx, axis=0)

            def win(w, d_tab):
                o = jax.lax.dynamic_index_in_dim(bs, w * WR, keepdims=False)
                o = jnp.minimum(o, C - E)
                wb = jax.lax.dynamic_slice_in_dim(bs, w * WR, WR)
                wr = jax.lax.dynamic_slice_in_dim(rs, w * WR, WR)
                li = jnp.clip(wb - o, 0, E - 1)
                box = jax.lax.dynamic_slice(d_tab, (o, 0), (E, 64))
                box = box.at[li].add(wr)
                return jax.lax.dynamic_update_slice(d_tab, box, (o, 0))

            d_tab = jax.lax.fori_loop(0, NW, win, d_tab)
            return c + d_tab[0, 0] * 1e-20 + 1e-6, d_tab

        c, d_tab = jax.lax.fori_loop(0, K, body, (c, d_tab))
        return c + d_tab.sum() * 1e-20
    return f


s = slope(mk_full, (shell0, rows))
log(exp="r4_full_block_sorted_windows", M=M, NW=NW, E=E,
    per_op_s=round(s, 5), ns_per_row=round(s / M * 1e9, 3),
    note="complete candidate placement vs ~190ns/row big-table scatter")

# --- 4. reference: the current big-table scatter on the same rows ---------


def mk_big(K):
    @jax.jit
    def f(c, bb, rr):
        def body(k, c):
            b = (bb + k.astype(jnp.int32) * 4096 + c.astype(jnp.int32)) % C
            out = jnp.zeros((C, 64), jnp.float32).at[b].add(rr)
            return c + out[0, 0] * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_big, (shell0, rows))
log(exp="r4_big_table_reference", M=M, C=C, per_op_s=round(s, 5),
    ns_per_row=round(s / M * 1e9, 3))

print("done", flush=True)
