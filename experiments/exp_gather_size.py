"""Gather pricing vs table SIZE and row width (slope protocol).

fwd_ablate showed the (16.7M, 8) = 537 MB cell-table gather costs
14.6 ns/idx while a (2M, 8) = 64 MB table costs 5 ns/idx — gather, like
scatter, is table-size-bound.  This grid decides the supercell design:
if a (16.7M, 64) = 4.3 GB table gathers at <= ~25 ns/idx, QUAD-grouped
supercell rows (4 samples per index) cut the march's gather cost 2-3x.

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
    return (timed_host(make_f(K2), *args)
            - timed_host(make_f(K1), *args)) / (K2 - K1)


key = jax.random.PRNGKey(0)
M = 1 << 22
print("devices:", jax.devices(), flush=True)

for W, Clog in [(8, 21), (8, 24), (32, 24), (64, 24), (64, 22), (128, 24)]:
    C = 1 << Clog
    tbl = jax.random.uniform(key, (C, W), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, C, jnp.int32)

    def mk(K, C=C):
        @jax.jit
        def f(c, tt, ii):
            def body(k, c):
                i = (ii + (c + k).astype(jnp.int32)) % C
                return c + jnp.take(tt, i, axis=0).sum() * 1e-20 + 1e-6
            return jax.lax.fori_loop(0, K, body, c)
        return f

    s = slope(mk, (tbl, idx))
    log(exp="gather_grid", W=W, C=C, mb=round(C * W * 4 / 2**20),
        n_idx=M, per_op_s=round(s, 5), ns_per_idx=round(s / M * 1e9, 3))
    del tbl
