"""Round-3: slab batching sweep for the shear-warp scan (TPU)."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_slabbatch_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig
from differender_tpu.fastpath import render_fast
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain(f, n, args=()):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(n):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / n


VOL, IMG = 256, 512
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG))
print("devices:", jax.devices(), flush=True)


def mk(mode, B):
    if mode == "grad":
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(render_fast(
                v_, t_, lf, cfg, intermediate=576, planes_per_voxel=2.0,
                slab_batch=B).image ** 2), argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0
    else:
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render_fast(v, t, lf, cfg, intermediate=576,
                              planes_per_voxel=2.0, slab_batch=B).image
            return c + 1 + img.sum() * 0
    return f


for B in (1, 2, 4, 8):
    for mode in ("fwd", "grad"):
        try:
            t = chain(mk(mode, B), n=2, args=(vol, tf))
            log(exp="slabbatch", B=B, mode=mode, s=round(t, 4))
        except Exception as e:
            log(exp="slabbatch", B=B, mode=mode,
                error=f"{type(e).__name__}: {e}"[:300])
