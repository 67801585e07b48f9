"""Round-4: 512^3 parity ladder with stride-2 grouping + sorted VJP.

Round-3 ladder (r3_highres_results.jsonl): 512^3/512^2 parity fwd 1.02 s,
fwd+bwd (joint vol+TF) 9.82 s — per-SAMPLE stride-2 gathers and an AD
scatter into the 4.3 GB table cotangent.  Round-4 changes measured here:

  * stride-2 step grouping (G=2 at sr=1): half the gather indices fwd,
    half the scatter rows bwd (config.supercell_group stride-2 bound);
  * march_vjp="sorted" over the stride-2 table (even-base keys,
    stride-2 fold): replaces the multi-GB-table AD scatter entirely.

Honest chained protocol.  Appends to r4_highres_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_highres_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

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


VOL, IMG, MS, TF_RES, SR = 512, 512, 896, 128, 1.0
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
                    max_samples=MS, march_table="super64s2")
srt = base.replace(march_vjp="sorted")

runs = [
    # round-3 reference points first (same session, so same relay state)
    ("s2_fwd_b16_grouped", base.replace(block_size=16), "fwd"),
    ("s2_grad_ad_b16_grouped", base.replace(block_size=16), "grad"),
    ("s2_grad_sorted_b16", srt.replace(block_size=16), "grad"),
    ("s2_grad_sorted_b32", srt.replace(block_size=32), "grad"),
    ("s2_grad_sorted_b64", srt.replace(block_size=64), "grad"),
    ("s2_grad_sorted_b64_w256k", srt.replace(
        block_size=64, vjp_window_rows=1 << 18), "grad"),
]

for name, cfg, mode in runs:
    grp = cfg.supercell_group(SR)
    try:
        t = chain(make(cfg, mode), n=(1 if mode == "grad" else 2),
                  args=(vol, tf))
        log(exp="r4_highres", run=name, mode=mode, group=grp,
            block=cfg.block_size, wrows=cfg.vjp_window_rows,
            brows=cfg.vjp_box_rows, s=round(t, 4))
    except Exception as e:
        log(exp="r4_highres", run=name, group=grp,
            error=f"{type(e).__name__}: {e}"[:300])
