"""Round-4 headline selection: N=3 variance-aware re-measurement.

The r4_sorted_march sweep found march_vjp="sorted" beating the AD scatter
at the headline config, but with large run-to-run spread on the congested
relay (b64_skip: 1.78 vs 3.54 s on two runs).  This re-measures the
candidates with THREE individually-timed iterations of one chain each
(same protocol as bench.py), plus a new block=128 point, so the headline
config choice and its variance are recorded honestly.

Appends to experiments/r4_headline_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_headline_results.jsonl")

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


def chain_samples(f, n, args=()):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))   # warmup/compile
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


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
srt = base.replace(march_vjp="sorted")

runs = [
    ("parity_sorted_b64_w128k", srt.replace(block_size=64), "grad"),
    ("parity_sorted_b64_w256k", srt.replace(
        block_size=64, vjp_window_rows=1 << 18), "grad"),
    ("parity_sorted_b128_w256k", srt.replace(
        block_size=128, vjp_window_rows=1 << 18), "grad"),
    ("parity_ad_b16_ref", base.replace(block_size=16), "grad"),
    ("analytic_sorted_b64_w128k", srt.replace(
        analytic_normals=True, block_size=64), "grad"),
    ("parity_fwd_b64", base.replace(block_size=64), "fwd"),
    ("parity_fwd_b16", base.replace(block_size=16), "fwd"),
]

for name, cfg, mode in runs:
    try:
        samples = chain_samples(make(cfg, mode), n=3, args=(vol, tf))
        log(exp="r4_headline", run=name, mode=mode,
            block=cfg.block_size, wrows=cfg.vjp_window_rows,
            brows=cfg.vjp_box_rows, samples=samples,
            mean_s=round(sum(samples) / len(samples), 4))
    except Exception as e:
        log(exp="r4_headline", run=name, error=f"{type(e).__name__}: {e}"[:300])
