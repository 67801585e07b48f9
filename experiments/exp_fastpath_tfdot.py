"""A/B the real render_fast after swapping hat-TF -> MXU-dot TF.

Headline config: 256^3 vol, 512^2 img, O=768, 2 planes/voxel.
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

    @jax.jit
    def fwd(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_fast(v, t, lf, cfg, intermediate=O,
                          planes_per_voxel=PPV).image
        return c + 1 + img.sum() * 0

    @jax.jit
    def step(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(render_fast(
            v_, t_, lf, cfg, intermediate=O,
            planes_per_voxel=PPV).image ** 2), argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0 + g[1].sum() * 0

    fwd_s = chain(fwd, (vol, tf))
    step_s = chain(step, (vol, tf))
    rec = {"variant": "render_fast_tfdot", "fwd_s": round(fwd_s, 4),
           "fwd_bwd_s": round(step_s, 4)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
