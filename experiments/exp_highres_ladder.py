"""Config-ladder "high-res" rung with the round-2 exact march:
512^3 volume -> 1024^2 image (the regime where the round-1 exact path
faulted the device).  march_table auto resolves to cell8 at 512^3 (the
super64 table would be 34 GB); ERT block skip on.

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

V, IMG, MS, SR = 512, 1024, 512, 0.5


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain(f, args, n=1):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(n):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (V,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)
    for tag, cfg in [
        ("hr/cell8/b8", RenderConfig(volume_shape=(V,) * 3,
                                     image_shape=(IMG, IMG),
                                     max_samples=MS, block_size=8,
                                     analytic_normals=True,
                                     march_table="cell8")),
        ("hr/flat/b8", RenderConfig(volume_shape=(V,) * 3,
                                    image_shape=(IMG, IMG),
                                    max_samples=MS, block_size=8,
                                    analytic_normals=True,
                                    march_table="flat")),
    ]:
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

        ok = True
        for mode in ("fwd", "grad"):
            try:
                s = chain(mk(mode), (vol, tf))
            except Exception as e:
                ok = False
                log(exp="highres", tag=tag, mode=mode,
                    error=f"{type(e).__name__}: {e}"[:250])
                continue
            log(exp="highres", tag=tag, mode=mode, s=round(s, 4))
        if ok:
            break  # only fall back to flat if cell8 failed


if __name__ == "__main__":
    main()
