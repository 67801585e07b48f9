"""Round-4 session 6: the 512^3 sorted retry + the last unmeasured
reference workload.

  * 512^3 parity fwd+bwd with march_vjp=sorted over the stride-2 table
    crashed the remote compiler at block 64 (session 5) — retry at block
    32 (the headline's block-128 crash had the same signature; smaller
    march blocks shrink the per-block placement graph).
  * SURVEY §6 workload 3 (the standalone TF-optimization recipe,
    `taichi_volume_raycaster.py:470-499,548-550`): 256^3 volume, 240^2
    image, max_samples 2048, fwd render at sr=8 (target), optimization
    steps at sr=2 — measure one fwd+bwd TF-momentum-style step and the
    sr=8 target render.
  * nondiff fwd sr=1 at the shipped occupancy defaults (bench aux).

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

from differender_tpu import RenderConfig, render, render_nondiff
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


key = jax.random.PRNGKey(0)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)


def make_grad(cfg, sr):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render(v_, t_, lf, cfg, sampling_rate=sr).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


# 1. 512^3 sorted retry at block 32
try:
    key5 = jax.random.PRNGKey(5)
    vol512 = jax.random.uniform(key5, (512,) * 3, jnp.float32) * 0.5
    cfg512 = RenderConfig(volume_shape=(512,) * 3, image_shape=(512, 512),
                          max_samples=1024, block_size=32,
                          march_vjp="sorted")
    s = chain_samples(make_grad(cfg512, 1.0), 1, args=(vol512, tf))
    log(exp="r4_session6", run="512_parity_sorted_b32", samples=s)
    del vol512
except Exception as e:
    log(exp="r4_session6", run="512_parity_sorted_b32",
        error=f"{type(e).__name__}: {e}"[:300])

vol_phantom = jnp.asarray(ct_phantom(256))

# 2. workload 3: TF-opt recipe shapes
try:
    cfg_w3 = RenderConfig(volume_shape=(256,) * 3, image_shape=(240, 240),
                          max_samples=2048, block_size=64,
                          march_table="super64", march_vjp="sorted")

    @jax.jit
    def step_tf(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda t_: jnp.mean(
            render(v, t_, lf, cfg_w3, sampling_rate=2.0).image ** 2))(t)
        return c + 1 + g.sum() * 0

    s = chain_samples(step_tf, 2, args=(vol_phantom, tf))
    log(exp="r4_session6", run="w3_tfopt_step_sr2", samples=s)

    @jax.jit
    def fwd8(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg_w3.replace(
            analytic_normals=True), sampling_rate=8.0).image
        return c + 1 + img.sum() * 0

    s = chain_samples(fwd8, 1, args=(vol_phantom, tf))
    log(exp="r4_session6", run="w3_target_render_sr8", samples=s)
except Exception as e:
    log(exp="r4_session6", run="w3", error=f"{type(e).__name__}: {e}"[:300])

# 3. nondiff fwd sr=1 on shipped defaults (bench aux)
try:
    vol_noise = jax.random.uniform(key, (256,) * 3, jnp.float32) * 0.5
    cfg = RenderConfig(volume_shape=(256,) * 3, image_shape=(512, 512),
                       max_samples=512, block_size=16,
                       march_table="super64")

    @jax.jit
    def fnd(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=1.0).image
        return c + 1 + img.sum() * 0

    s = chain_samples(fnd, 2, args=(vol_noise, tf))
    log(exp="r4_session6", run="nondiff_sr1_defaults", samples=s)
except Exception as e:
    log(exp="r4_session6", run="nondiff_sr1_defaults",
        error=f"{type(e).__name__}: {e}"[:300])

log(exp="r4_session6", run="done")
