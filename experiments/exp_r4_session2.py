"""Round-4 session 2: headline stability + sr=16 flagship tuning, on TPU.

Two questions, one process (CLAUDE.md rule 6):

  A. The sorted-window march VJP replaced the AD scatter in the bench
     config (march_vjp="sorted", block 64) but the sweep that chose it
     (r4_sorted_march_results.jsonl) shows 2x run-to-run spread on the
     congested relay (1.78 vs 3.54 s for the same config).  Re-measure the
     candidate configs with N=3 individually-timed chained samples each to
     pick the window/block point on more than one observation.

  B. The reference's flagship inference workload (800^2, sr=16,
     `/root/reference/examples/render_nondiff.py:20,27`) sits at ~10.7 s —
     just above the round-2 verdict's single-digit target.  Sweep the
     remaining knobs: strip count, occupancy macrocell edge (4 vs 8; finer
     cells resolve thinner empty gaps and the phantom's interior), jump
     cap, and the compaction-ladder floor.

Honest chained protocol throughout (CLAUDE.md rule 4).  Appends to
experiments/r4_session2_results.jsonl.
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
    """One warmup + n individually-timed chained iterations."""
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


# --------------------------------------------------------------- part A
A_RUNS = [
    ("sorted_b64_w128k", dict(block_size=64, march_vjp="sorted"), 3),
    ("sorted_b64_w256k", dict(block_size=64, march_vjp="sorted",
                              vjp_window_rows=1 << 18), 3),
    ("sorted_b128_w256k", dict(block_size=128, march_vjp="sorted",
                               vjp_window_rows=1 << 18), 2),
    ("ad_b16_control", dict(), 1),
    ("analytic_sorted_b32", dict(block_size=32, march_vjp="sorted",
                                 analytic_normals=True), 2),
]
for name, kw, n in A_RUNS:
    try:
        samples = chain_samples(make_grad(cfg0.replace(**kw)), n,
                                args=(vol_noise, tf))
        log(exp="r4_session2", part="A", run=name, samples=samples,
            mean_s=round(sum(samples) / len(samples), 4))
    except Exception as e:
        log(exp="r4_session2", part="A", run=name,
            error=f"{type(e).__name__}: {e}"[:300])


# --------------------------------------------------------------- part B
def make_nd(cfg, occ, strips):
    @jax.jit
    def f1(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=16.0,
                             occupancy=occ).image
        return c + 1 + img.sum() * 0

    def fs(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff_strips(v, t, lf, cfg, sampling_rate=16.0,
                                    n_strips=strips, occupancy=occ).image
        return c + 1 + img.sum() * 0

    return f1 if strips == 1 else fs


B_RUNS = [
    # (name, image, strips, cell, max_dist, cfg overrides)
    ("512_c8_base", 512, 1, 8, 15, {}),
    ("512_c4", 512, 1, 4, 24, {}),
    ("800_s4_c8_base", 800, 4, 8, 15, {}),
    ("800_s4_c4", 800, 4, 4, 24, {}),
    ("800_s2_c8", 800, 2, 8, 15, {}),
    ("800_s4_c8_cmin4k", 800, 4, 8, 15, dict(compaction_min=4096)),
    ("800_s4_c4_cmin4k", 800, 4, 4, 24, dict(compaction_min=4096)),
]
for name, img_res, strips, cell, md, kw in B_RUNS:
    try:
        cfg = cfg0.replace(image_shape=(img_res, img_res),
                           analytic_normals=True, **kw)
        occ = jax.jit(build_occupancy,
                      static_argnames=("config", "cell", "max_dist"))(
            vol_phantom, tf, cfg, cell=cell, max_dist=md)
        samples = chain_samples(make_nd(cfg, occ, strips), 1,
                                args=(vol_phantom, tf))
        log(exp="r4_session2", part="B", run=name, strips=strips,
            cell=cell, max_dist=md, samples=samples)
    except Exception as e:
        log(exp="r4_session2", part="B", run=name,
            error=f"{type(e).__name__}: {e}"[:300])

log(exp="r4_session2", part="done")
