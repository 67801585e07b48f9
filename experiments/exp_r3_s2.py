"""Round-3: stride-2 supercell parity at 512^3 -> 1024^2 (TPU).

Round-2/3 cell8 parity at this scale: fwd 15.7 s, backward crashes the
remote compiler.  super64s2 gives one 64-wide row per sample (whole
stencil) with a 4.3 GB table.
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_s2_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig, render
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


print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (512,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)


def mk(cfg, mode):
    if mode == "grad":
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(
                render(v_, t_, lf, cfg, sampling_rate=0.5).image ** 2),
                argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0
    else:
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            return c + 1 + render(v, t, lf, cfg,
                                  sampling_rate=0.5).image.sum() * 0
    return f


base = RenderConfig(volume_shape=(512,) * 3, image_shape=(1024, 1024),
                    max_samples=512, block_size=16,
                    march_table="super64s2")
runs = [
    ("s2_fwd_skip", base, "fwd", 1),
    ("s2_grad_skip", base, "grad", 1),
    ("s2_grad_noskip", base.replace(ert_block_skip=False), "grad", 1),
    ("cell8_grad_noskip",
     base.replace(march_table="cell8", ert_block_skip=False), "grad", 1),
]
for name, cfg, mode, n in runs:
    try:
        t = chain(mk(cfg, mode), n=n, args=(vol, tf))
        log(exp="s2", run=name, s=round(t, 4))
    except Exception as e:
        log(exp="s2", run=name, error=f"{type(e).__name__}: {e}"[:250])
