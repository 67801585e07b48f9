"""Scatter pricing round 4: what EXACTLY binds the big-table scatter cost?

The parity backward's remaining wall (~3.5 s of 4.50 s fwd+bwd at the
headline config) is the AD scatter of grouped 64-wide row cotangents into
the (X*Y*Z, 64) supercell table (4.3 GB at 256^3).  Round-2/3 pricing
(row_scatter_results.jsonl) showed a cliff: ~7-14 ns/row into <=32 MB
targets vs ~190-200 ns/row into >=128 MB, insensitive to sortedness /
bf16 / segment_sum.  This experiment pins down the mechanism so a
restructured backward can be designed (or ruled out) on evidence:

  cliff_w64      — allocation-size sweep C in {64K..1M} rows at W=64
  range_in_big   — BIG allocation (2M rows), indices confined to 16K rows:
                   distinguishes allocation-size-bound vs index-range-bound
  vmap_boxes     — vmapped per-box scatters (B x (CS,64)): does a batched
                   scatter price per-box or per-total-allocation?
  unique_perm    — unique_indices=True with genuinely unique indices into a
                   big table: does XLA parallelize collision-free scatter?
  dus_box        — the candidate backward pattern end-to-end: dynamic_slice
                   a box out of the big table (carry), scatter into the box,
                   dynamic_update_slice back — per-row price incl. the dense
                   slice/fold traffic (table carried through the loop so XLA
                   can alias in place).
  dense_add      — reference: plain (C,64)+(C,64) add (streaming bound).

Appends JSON lines to experiments/r4_scatter_results.jsonl.
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


M = 1 << 22                      # 4M rows per op
key = jax.random.PRNGKey(0)
up64 = jax.random.uniform(key, (M, 64), jnp.float32)
print("devices:", jax.devices(), flush=True)

# --- 1. allocation-size cliff at W=64 -----------------------------------
for C in (1 << 16, 1 << 17, 1 << 18, 1 << 19, 1 << 20):
    idx = jax.random.randint(key, (M,), 0, C, jnp.int32)

    def mk(K, C=C):
        @jax.jit
        def f(c, ii, uu):
            def body(k, c):
                i = (ii + (c + k).astype(jnp.int32)) % C
                out = jnp.zeros((C, 64), jnp.float32).at[i].add(uu)
                return c + out.sum() * 1e-20 + 1e-6
            return jax.lax.fori_loop(0, K, body, c)
        return f

    s = slope(mk, (idx, up64))
    log(exp="r4_cliff_w64", C=C, mb=round(C * 64 * 4 / 2**20),
        n_idx=M, per_op_s=round(s, 5), ns_per_idx=round(s / M * 1e9, 3))

# --- 2. big allocation, tiny index range --------------------------------
CBIG = 1 << 21                   # 512 MB allocation
CS = 1 << 14                     # indices confined to 4 MB worth of rows
idx_sm = jax.random.randint(key, (M,), 0, CS, jnp.int32)


def mk_range(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % CS
            out = jnp.zeros((CBIG, 64), jnp.float32).at[i].add(uu)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_range, (idx_sm, up64))
log(exp="r4_range_in_big", C_alloc=CBIG, C_range=CS, n_idx=M,
    per_op_s=round(s, 5), ns_per_idx=round(s / M * 1e9, 3))

# --- 3. vmapped per-box scatters ----------------------------------------
B = 64
CSB = 1 << 15                    # 8 MB per box; total alloc 512 MB
Mb = M // B
idx_b = jax.random.randint(key, (B, Mb), 0, CSB, jnp.int32)
up_b = up64.reshape(B, Mb, 64)


def mk_vbox(K):
    @jax.jit
    def f(c, ii, uu):
        def body(k, c):
            i = (ii + (c + k).astype(jnp.int32)) % CSB
            out = jax.vmap(
                lambda ib, ub: jnp.zeros((CSB, 64), jnp.float32)
                .at[ib].add(ub))(i, uu)
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_vbox, (idx_b, up_b))
log(exp="r4_vmap_boxes", B=B, C_box=CSB, n_idx=M,
    per_op_s=round(s, 5), ns_per_idx=round(s / M * 1e9, 3))

# --- 4. unique indices into a big table ---------------------------------
CU = 1 << 23                     # 2 GB table, >= M so a permutation exists
perm = jax.random.permutation(jax.random.PRNGKey(1), CU)[:M]

for uniq in (False, True):
    def mk_uni(K, uniq=uniq):
        @jax.jit
        def f(c, ii, uu):
            def body(k, c):
                i = (ii + (c + k).astype(jnp.int32)) % CU
                out = jnp.zeros((CU, 64), jnp.float32).at[i].add(
                    uu, unique_indices=uniq)
                return c + out.sum() * 1e-20 + 1e-6
            return jax.lax.fori_loop(0, K, body, c)
        return f

    s = slope(mk_uni, (perm, up64))
    log(exp="r4_unique_perm", unique=uniq, C=CU, n_idx=M,
        per_op_s=round(s, 5), ns_per_idx=round(s / M * 1e9, 3))

# --- 5. dynamic-slice box + small scatter + dus back --------------------
CBOX = 1 << 17                   # 32 MB box out of the 512 MB table
idx_box = jax.random.randint(key, (M,), 0, CBOX, jnp.int32)


def mk_dus(K):
    @jax.jit
    def f(c, ii, uu):
        tbl = jnp.zeros((CBIG, 64), jnp.float32)

        def body(k, carry):
            c, tbl = carry
            o = ((c + k).astype(jnp.int32) % 16) * (CBOX // 2)
            box = jax.lax.dynamic_slice(tbl, (o, 0), (CBOX, 64))
            box = box.at[ii % CBOX].add(uu)
            tbl = jax.lax.dynamic_update_slice(tbl, box, (o, 0))
            return c + box[0, 0] * 1e-20 + 1e-6, tbl

        c, tbl = jax.lax.fori_loop(0, K, body, (c, tbl))
        return c + tbl.sum() * 1e-20
    return f


s = slope(mk_dus, (idx_box, up64))
log(exp="r4_dus_box", C_alloc=CBIG, C_box=CBOX, n_idx=M,
    per_op_s=round(s, 5), ns_per_idx=round(s / M * 1e9, 3))

# --- 6. dense streaming reference ---------------------------------------
dense_a = jax.random.uniform(key, (CBIG, 64), jnp.float32)


def mk_dense(K):
    @jax.jit
    def f(c, aa):
        def body(k, c):
            out = aa + c
            return c + out.sum() * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


s = slope(mk_dense, (dense_a,))
log(exp="r4_dense_add", C=CBIG, per_op_s=round(s, 5),
    gb_s=round(CBIG * 64 * 4 * 2 / max(s, 1e-9) / 2**30, 1))

print("done", flush=True)
