"""Round-24 (VERDICT r4 item 6 / r3 item 4): Raycaster batched GRADIENT
step at BS=8 headline scale — batch_mode='scan' vs 'vmap' vs 8 serial
single-view steps.

The scan mode exists because vmap lowers the per-view ERT block-skip cond
to a select (every view marches to the batch's deepest ray); scan keeps
per-view ERT at the cost of serialized views.  Never measured at the
headline config (the round-3 done-criterion).  Target: scan <= ~1.2x the
single-view sum.

One arm per invocation (r15 lesson); drive with:

    for a in singles scan vmap; do
        timeout 1800 python experiments/exp_r24_scan_bs8.py $a; done

Chained protocol (CLAUDE.md rule 4).  Appends to
experiments/r8_headline_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r8_headline_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu.raycaster import Raycaster
from differender_tpu.transfer import get_tf_torch_layout


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR, BS = 256, 512, 512, 1.0, 8
arm = sys.argv[1]

vol = jax.random.uniform(jax.random.PRNGKey(0), (1, VOL, VOL, VOL),
                         jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf_torch_layout("tf1", 128), np.float32))
angles = np.linspace(0.0, 2 * np.pi, BS, endpoint=False)
lfs = np.stack([[np.cos(a) * 2.4, 0.8, np.sin(a) * 2.4] for a in angles]
               ).astype(np.float32)

rc = Raycaster((VOL, VOL, VOL), (IMG, IMG), 128, sampling_rate=SR,
               jitter=False, max_samples=MS, block_size=64,
               march_vjp="sorted", march_table="super64",
               batch_mode=("vmap" if arm == "vmap" else "scan"))


def loss_batched(v, t, lf_b, c):
    img = rc.forward(v, t, jnp.asarray(lf_b) + c * 1e-6)
    return jnp.mean(img ** 2)


def loss_single(v, t, lf_1, c):
    img = rc.forward(v, t, jnp.asarray(lf_1) + c * 1e-6)
    return jnp.mean(img ** 2)


if arm in ("scan", "vmap"):
    @jax.jit
    def f(c, v, t):
        g = jax.grad(loss_batched, argnums=(0, 1))(v, t, lfs, c)
        return c + 1 + g[0].sum() * 0
else:
    grad_1 = jax.jit(lambda c, v, t, lf_1: jax.grad(
        loss_single, argnums=(0, 1))(v, t, lf_1, c))

    def f(c, v, t):
        # 8 separate single-view programs (same compiled fn, different
        # lf argument), grads accumulated on device.
        acc = None
        for i in range(BS):
            g = grad_1(c, v, t, jnp.asarray(lfs[i]))
            acc = g if acc is None else (acc[0] + g[0], acc[1] + g[1])
        return c + 1 + acc[0].sum() * 0

try:
    t0 = time.time()
    c = jnp.float32(float(f(jnp.float32(0.0), vol, tf)))
    jax.block_until_ready(c)
    first = time.time() - t0
    samples = []
    for _ in range(2):
        t0 = time.time()
        c = jnp.float32(float(f(c, vol, tf)))
        jax.block_until_ready(c)
        samples.append(round(time.time() - t0, 3))
    log(exp="r24_scan_bs8", run=arm, bs=BS, first_s=round(first, 1),
        samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r24_scan_bs8", run=arm, bs=BS,
        error=f"{type(e).__name__}: {e}"[:300])
