"""Exact march with the hand-written tiled-scatter VJP on TPU.

Headline config; chained-camera protocol.
Appends JSON to experiments/cell_march_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "cell_march_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu import RenderConfig, render
from differender_tpu.transfer import get_tf

V, IMG, MS, R, SR = 256, 512, 512, 128, 1.0


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain(f, args, n=2):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(n):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (V,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", R)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)
    base = RenderConfig(volume_shape=(V,) * 3, image_shape=(IMG, IMG),
                        max_samples=MS, march_table="super64",
                        march_vjp="tiled")
    variants = [
        ("tiled/analytic/b16/t16", base.replace(analytic_normals=True,
                                                block_size=16)),
        ("tiled/analytic/b16/t32", base.replace(analytic_normals=True,
                                                block_size=16, vjp_tile=32,
                                                vjp_box=48)),
        ("tiled/parity/b8/t16", base.replace(block_size=8)),
    ]
    for tag, cfg in variants:
        def mk(mode, cfg=cfg):
            if mode == "fwd":
                @jax.jit
                def f(c, v, t):
                    lf = jnp.asarray(lf0) + c * 1e-6
                    img = render(v, t, lf, cfg, sampling_rate=SR).image
                    return c + 1 + img.sum() * 1e-20
            else:
                @jax.jit
                def f(c, v, t):
                    lf = jnp.asarray(lf0) + c * 1e-6
                    g = jax.grad(lambda v_, t_: jnp.mean(render(
                        v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
                        argnums=(0, 1))(v, t)
                    return c + 1 + g[0].sum() * 1e-20 + g[1].sum() * 1e-20
            return f

        for mode in ("grad", "fwd"):
            try:
                s = chain(mk(mode), (vol, tf))
            except Exception as e:
                log(exp="march_tiled", tag=tag, mode=mode,
                    error=f"{type(e).__name__}: {e}"[:300])
                continue
            log(exp="march_tiled", tag=tag, mode=mode, s=round(s, 4))


if __name__ == "__main__":
    main()
