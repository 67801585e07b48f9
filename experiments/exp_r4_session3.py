"""Round-4 session 3: follow-ups from exp_r4_session2 measurements.

  * sorted VJP: window 64k (below the 128k winner) and analytic at block
    64 (analytic at block 32 measured SLOWER than parity at 64 — block,
    not stencil math, seems to set the backward cost).
  * occupancy defaults: does cell=4/max_dist=24 (the sr=16 winner: 5.33
    -> 2.58 s at 512^2, 10.6 -> 7.5 s at 800^2) cost anything at the
    sr=1 headline?  And does compaction_min 4096 help or hurt there?
  * sr=16 extremes: cell=2/max_dist=48 at 512^2; max_dist 32 at 800^2.

Appends to experiments/r4_session2_results.jsonl (same session family).
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_session2_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu import (RenderConfig, render, render_nondiff,
                             render_nondiff_strips)
from differender_tpu.occupancy import build_occupancy
from differender_tpu.transfer import get_tf
from differender_tpu.utils.scenes import ct_phantom


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain_samples(f, n, args=()):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


VOL, IMG, MS, TF_RES, SR = 256, 512, 512, 128, 1.0
key = jax.random.PRNGKey(0)
vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
vol_phantom = jnp.asarray(ct_phantom(VOL))
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)

cfg0 = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                    max_samples=MS, block_size=16, march_table="super64")


def make_grad(cfg):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


for name, kw, n in [
    ("sorted_b64_w64k", dict(block_size=64, march_vjp="sorted",
                             vjp_window_rows=1 << 16), 2),
    ("analytic_sorted_b64", dict(block_size=64, march_vjp="sorted",
                                 analytic_normals=True), 2),
]:
    try:
        s = chain_samples(make_grad(cfg0.replace(**kw)), n,
                          args=(vol_noise, tf))
        log(exp="r4_session3", part="A", run=name, samples=s,
            mean_s=round(sum(s) / len(s), 4))
    except Exception as e:
        log(exp="r4_session3", part="A", run=name,
            error=f"{type(e).__name__}: {e}"[:300])


def make_nd(cfg, occ, strips, sr):
    @jax.jit
    def f1(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=sr,
                             occupancy=occ).image
        return c + 1 + img.sum() * 0

    def fs(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff_strips(v, t, lf, cfg, sampling_rate=sr,
                                    n_strips=strips, occupancy=occ).image
        return c + 1 + img.sum() * 0

    return f1 if strips == 1 else fs


RUNS = [
    # (name, scene, image, sr, strips, cell, max_dist, overrides, n)
    ("sr1_c8_cmin16k", vol_noise, 512, 1.0, 1, 8, 15, {}, 3),
    ("sr1_c4_cmin16k", vol_noise, 512, 1.0, 1, 4, 24, {}, 3),
    ("sr1_c4_cmin4k", vol_noise, 512, 1.0, 1, 4, 24,
     dict(compaction_min=4096), 3),
    ("sr16_512_c2_md48", vol_phantom, 512, 16.0, 1, 2, 48, {}, 1),
    ("sr16_800_s4_c4_md32_cmin4k", vol_phantom, 800, 16.0, 4, 4, 32,
     dict(compaction_min=4096), 1),
    ("sr16_800_s4_c4_md24_cmin4k_rep", vol_phantom, 800, 16.0, 4, 4, 24,
     dict(compaction_min=4096), 1),
]
for name, scene, img_res, sr, strips, cell, md, kw, n in RUNS:
    try:
        cfg = cfg0.replace(image_shape=(img_res, img_res),
                           analytic_normals=True, **kw)
        occ = jax.jit(build_occupancy,
                      static_argnames=("config", "cell", "max_dist"))(
            scene, tf, cfg, cell=cell, max_dist=md)
        s = chain_samples(make_nd(cfg, occ, strips, sr), n, args=(scene, tf))
        log(exp="r4_session3", part="B", run=name, strips=strips, cell=cell,
            max_dist=md, samples=s)
    except Exception as e:
        log(exp="r4_session3", part="B", run=name,
            error=f"{type(e).__name__}: {e}"[:300])

log(exp="r4_session3", part="done")
