"""Round-3: grouped parity sampling + ERT block skip memory, on TPU.

Measures, at the headline config (256^3 vol, 512^2 img, 512 steps, sr=1):
  1. parity fwd / fwd+bwd with the NEW grouped parity supercell sampling
     (group 4 at sr=1) across block sizes, ert_block_skip on/off;
  2. analytic fwd+bwd as the round-2 reference point.
Honest chained protocol throughout (CLAUDE.md rule 4).
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_parity_results.jsonl")
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


VOL, IMG, MS, TF_RES, SR = 256, 512, 512, 128, 1.0
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)


def make(cfg, mode):
    if mode == "grad":
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(
                render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
                argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0
    else:
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render(v, t, lf, cfg, sampling_rate=SR).image
            return c + 1 + img.sum() * 0
    return f


base = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                    max_samples=MS, march_table="super64")

runs = [
    # round-2 reference points
    ("analytic_b16_skip", base.replace(analytic_normals=True, block_size=16),
     "grad"),
    # parity, grouped (supercell_group(1.0) now = 4 in parity mode)
    ("parity_b8_noskip", base.replace(block_size=8, ert_block_skip=False),
     "grad"),
    ("parity_b16_noskip", base.replace(block_size=16, ert_block_skip=False),
     "grad"),
    ("parity_b16_skip", base.replace(block_size=16), "grad"),
    ("parity_b8_skip", base.replace(block_size=8), "grad"),
    ("parity_b32_noskip", base.replace(block_size=32, ert_block_skip=False),
     "grad"),
    ("parity_fwd_b16_skip", base.replace(block_size=16), "fwd"),
]

for name, cfg, mode in runs:
    grp = cfg.supercell_group(SR)
    try:
        t = chain(make(cfg, mode), n=(1 if mode == "grad" else 2),
                  args=(vol, tf))
        log(exp="r3_parity", run=name, mode=mode, group=grp,
            block=cfg.block_size, skip=cfg.ert_block_skip, s=round(t, 4))
    except Exception as e:
        log(exp="r3_parity", run=name, error=f"{type(e).__name__}: {e}"[:300])
