"""A/B TF-dot/resample precision in the real render_fast on TPU.

For precision in {DEFAULT, HIGH, HIGHEST}: fwd, fwd+bwd (chained), and
L-inf / mean-abs of the image vs the HIGHEST render (fidelity cost of the
bf16 MXU passes).  Headline config.  ONE process.
Appends JSON to experiments/fastpath_profile_results.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu import RenderConfig
from differender_tpu.fastpath import render_fast
from differender_tpu.transfer import get_tf

OUT = os.path.join(os.path.dirname(__file__),
                   "fastpath_profile_results.jsonl")
V, IMG, O, PPV, R = 256, 512, 768, 2.0, 128


def chain(f, args, n=2):
    c = f(jnp.float32(0.0), *args)
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n):
        c = f(c, *args)
    jax.block_until_ready(c)
    return (time.time() - t0) / n


def main():
    cfg = RenderConfig(volume_shape=(V,) * 3, image_shape=(IMG, IMG))
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (V,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", R)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)

    ref_img = None
    recs = []
    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        @jax.jit
        def fwd(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render_fast(v, t, lf, cfg, intermediate=O,
                              planes_per_voxel=PPV, precision=prec).image
            return c + 1 + img.sum() * 0

        @jax.jit
        def step(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(render_fast(
                v_, t_, lf, cfg, intermediate=O, planes_per_voxel=PPV,
                precision=prec).image ** 2), argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0 + g[1].sum() * 0

        fwd_s = chain(fwd, (vol, tf))
        step_s = chain(step, (vol, tf))
        img = np.asarray(jax.jit(lambda v, t: render_fast(
            v, t, jnp.asarray(lf0), cfg, intermediate=O,
            planes_per_voxel=PPV, precision=prec).image)(vol, tf))
        if ref_img is None:
            ref_img = img
        rec = {"variant": f"render_fast_tfdot_{name}",
               "fwd_s": round(fwd_s, 4), "fwd_bwd_s": round(step_s, 4),
               "linf_vs_highest": round(float(np.abs(img - ref_img).max()), 6),
               "meanabs_vs_highest":
                   round(float(np.abs(img - ref_img).mean()), 8)}
        print(json.dumps(rec), flush=True)
        recs.append(rec)

    with open(OUT, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
