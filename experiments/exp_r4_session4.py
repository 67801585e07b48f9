"""Round-4 session 4: close the sweeps from sessions 2-3.

  * sorted VJP window: 64k beat 128k (1.52 vs 1.67 s) — probe 32k/16k.
  * occupancy cell=2/md=48 beat cell=4 at 512^2 sr=16 (2.06 vs 2.58 s) —
    try it at 800^2, and check the sr=1 headline stays neutral.
  * bench honesty: the bench builds the occupancy grid INSIDE the timed
    render (render_nondiff_strips with occupancy=None); measure the
    inline-build variant of the winners so the bench prediction is real.

Appends to experiments/r4_session2_results.jsonl.
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
    ("sorted_b64_w32k", dict(block_size=64, march_vjp="sorted",
                             vjp_window_rows=1 << 15), 2),
    ("sorted_b64_w16k", dict(block_size=64, march_vjp="sorted",
                             vjp_window_rows=1 << 14), 2),
    ("sorted_b64_w64k_rep", dict(block_size=64, march_vjp="sorted",
                                 vjp_window_rows=1 << 16), 2),
]:
    try:
        s = chain_samples(make_grad(cfg0.replace(**kw)), n,
                          args=(vol_noise, tf))
        log(exp="r4_session4", part="A", run=name, samples=s,
            mean_s=round(sum(s) / len(s), 4))
    except Exception as e:
        log(exp="r4_session4", part="A", run=name,
            error=f"{type(e).__name__}: {e}"[:300])


def make_nd(cfg, occ, strips, sr):
    """occ="inline" builds the grid inside the timed program (what the
    public render_nondiff does when no grid is passed)."""
    inline = occ == "inline"

    @jax.jit
    def f1(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=sr,
                             occupancy=None if inline else occ).image
        return c + 1 + img.sum() * 0

    def fs(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff_strips(v, t, lf, cfg, sampling_rate=sr,
                                    n_strips=strips,
                                    occupancy=None if inline else occ).image
        return c + 1 + img.sum() * 0

    return f1 if strips == 1 else fs


RUNS = [
    # (name, scene, image, sr, strips, cell, max_dist, inline, overrides, n)
    ("sr16_800_s4_c2_md48", vol_phantom, 800, 16.0, 4, 2, 48, False,
     dict(compaction_min=4096), 1),
    ("sr16_800_s4_c2_md48_inline", vol_phantom, 800, 16.0, 4, 2, 48, True,
     dict(compaction_min=4096), 1),
    ("sr16_800_s4_c4_md24_inline", vol_phantom, 800, 16.0, 4, 4, 24, True,
     dict(compaction_min=4096), 1),
    ("sr16_512_c2_md48_inline", vol_phantom, 512, 16.0, 1, 2, 48, True,
     {}, 1),
    ("sr1_c2_md48", vol_noise, 512, 1.0, 1, 2, 48, False,
     dict(compaction_min=4096), 2),
]
for name, scene, img_res, sr, strips, cell, md, inline, kw, n in RUNS:
    try:
        cfg = cfg0.replace(image_shape=(img_res, img_res),
                           analytic_normals=True, occupancy_cell=cell,
                           occupancy_max_dist=md, **kw)
        occ = "inline" if inline else jax.jit(
            build_occupancy,
            static_argnames=("config", "cell", "max_dist"))(
            scene, tf, cfg, cell=cell, max_dist=md)
        s = chain_samples(make_nd(cfg, occ, strips, sr), n, args=(scene, tf))
        log(exp="r4_session4", part="B", run=name, strips=strips, cell=cell,
            max_dist=md, inline=inline, samples=s)
    except Exception as e:
        log(exp="r4_session4", part="B", run=name,
            error=f"{type(e).__name__}: {e}"[:300])

log(exp="r4_session4", part="done")
