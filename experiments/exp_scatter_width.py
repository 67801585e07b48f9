"""Scatter pricing round 3: row width x table size grid, + forward-march
component ablation (where do 2.5 s of the 3.5 s exact forward go?).

Slope protocol.  Appends JSON to experiments/row_scatter_results.jsonl.
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
print("devices:", jax.devices(), flush=True)

# ---- scatter width x table size ----------------------------------------
for W in (8, 32, 64):
    for C in (1 << 14, 1 << 17, 1 << 19, 1 << 21):
        M = 1 << 22
        idx = jax.random.randint(key, (M,), 0, C, jnp.int32)
        up = jax.random.uniform(key, (M, W), jnp.float32)

        def mk(K, C=C, W=W):
            @jax.jit
            def f(c, ii, uu):
                def body(k, c):
                    i = (ii + (c + k).astype(jnp.int32)) % C
                    out = jnp.zeros((C, W), jnp.float32).at[i].add(uu)
                    return c + out.sum() * 1e-20 + 1e-6
                return jax.lax.fori_loop(0, K, body, c)
            return f

        s = slope(mk, (idx, up))
        log(exp="scatter_grid", W=W, C=C, n_idx=M, per_op_s=round(s, 5),
            ns_per_idx=round(s / M * 1e9, 3),
            ns_per_elem=round(s / (M * W) * 1e9, 3))

# ---- forward-march component ablation ----------------------------------
# Reproduce one _eval_block_soa analytic block (K=32, N=512^2) piecewise.
from differender_tpu.sampling import (cell_table, _cell_base_fracs,
                                      _corner_weight_factors, _cell_rows,
                                      apply_tf_hat_soa)
from differender_tpu.shading import shade_soa
from differender_tpu.config import RenderConfig
from differender_tpu.transfer import get_tf

V = 256
K, N = 32, 512 * 512
cfg = RenderConfig(volume_shape=(V,) * 3, image_shape=(512, 512))
vol = jax.random.uniform(key, (V,) * 3, jnp.float32) * 0.5
cell = cell_table(vol)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
px = jax.random.uniform(key, (K, N), jnp.float32) * 1.6 - 0.8
py = jax.random.uniform(jax.random.PRNGKey(1), (K, N), jnp.float32) * 1.6 - 0.8
pz = jax.random.uniform(jax.random.PRNGKey(2), (K, N), jnp.float32) * 1.6 - 0.8


def mk_ablate(which):
    def build(Kreps):
        @jax.jit
        def f(c, cell, px, py, pz):
            def body(k, c):
                eps = (c + k) * 1e-7
                base, fx, fy, fz = _cell_base_fracs((V, V, V), px + eps, py,
                                                    pz)
                if which == "base_only":
                    return c + (base.sum() * 1e-20).astype(jnp.float32) \
                        + (fx.sum() + fy.sum() + fz.sum()) * 1e-20 + 1e-6
                vals = _cell_rows(cell, base)              # (8, K, N)
                if which == "gather_only":
                    return c + vals.sum() * 1e-20 + 1e-6
                wx, wy, wz = _corner_weight_factors(fx, fy, fz)
                intensity = jnp.sum(vals * (wx * wy * wz), axis=0)
                if which == "trilinear":
                    return c + intensity.sum() * 1e-20 + 1e-6
                from differender_tpu.sampling import _axis_bits
                dbx, dby, dbz = (2.0 * _axis_bits(a, px.ndim) - 1.0
                                 for a in range(3))
                gx = jnp.sum(vals * (dbx * wy * wz), axis=0)
                gy = jnp.sum(vals * (wx * dby * wz), axis=0)
                gz = jnp.sum(vals * (wx * wy * dbz), axis=0)
                if which == "tri_grad":
                    return c + (intensity.sum() + gx.sum() + gy.sum()
                                + gz.sum()) * 1e-20 + 1e-6
                r, g, b, a = apply_tf_hat_soa(tf, intensity)
                if which == "plus_tf":
                    return c + (r.sum() + g.sum() + b.sum()
                                + a.sum()) * 1e-20 + 1e-6
                pr, pg, pb, alpha = shade_soa(
                    px, py, pz, gx, gy, gz, r, g, b, a,
                    px * 0 + 0.3, py * 0 + 0.2, pz * 0 - 0.9,
                    np.array([1.2, 0.8, 2.0], np.float32), 1.0, cfg,
                    clamp_light=True)
                return c + (pr.sum() + pg.sum() + pb.sum()
                            + alpha.sum()) * 1e-20 + 1e-6
            return jax.lax.fori_loop(0, Kreps, body, c)
        return f
    return build


for which in ["base_only", "gather_only", "trilinear", "tri_grad",
              "plus_tf", "full_shade"]:
    s = slope(mk_ablate(which), (cell, px, py, pz))
    log(exp="fwd_ablate", which=which, K=K, N=N, per_block_s=round(s, 5))
