"""Round-12: why does the SECOND 512^3 blockwise step OOM when the first
succeeds?

r10 showed the cold b32 step completes end-to-end (loss + finite
d_volume) but the immediately-following warm step hits
RESOURCE_EXHAUSTED at its first backward block; the standalone
experiment (chained protocol, no big arrays held by the caller)
reproduces it.  Two hypotheses:

  (a) host-visible leak — something keeps device buffers alive across
      steps (enumerate jax.live_arrays() >= 8 MB after each step);
  (b) asynchronous deletion lag on the relay — step N+1's first big
      allocation races step N's pending frees (insert a settle delay
      and retry).

Appends to experiments/r5_sorted512_results.jsonl.
"""
import gc
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r5_sorted512_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu.config import RenderConfig
from differender_tpu.render import value_and_grad_blockwise
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def live_mb():
    """Device arrays >= 8 MB currently alive, as (MB, shape) pairs."""
    gc.collect()
    out = []
    total = 0.0
    for a in jax.live_arrays():
        mb = a.size * a.dtype.itemsize / (1 << 20)
        total += mb
        if mb >= 8:
            out.append([round(mb, 1), str(a.shape)])
    out.sort(reverse=True)
    return round(total, 1), out[:12]


VOL, IMG = 512, 512
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.standard_normal((VOL,) * 3, dtype=np.float32)
                  * 0.1 + 0.3)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.5, 1.0, 2.5], np.float32)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=512, block_size=32, march_vjp="sorted")


def loss_fn(out):
    return jnp.mean(out.image ** 2)


def step(c):
    lf = jnp.asarray(lf0) + c * 1e-6
    loss, (dv, dt) = value_and_grad_blockwise(
        vol, tf, lf, cfg, loss_fn, sampling_rate=1.0)
    return c + 1 + dv.ravel()[0] * 0 + loss * 0


c = jnp.float32(0.0)
# r13: after the per-block forward/backward block_until_ready fix
# (render.py value_and_grad_blockwise — warm-step enqueue pressure),
# steps 1+ are the WARM step-time measurement; no settle needed.
settle = [0, 0, 0, 0]            # seconds to sleep BEFORE each step
for i, pause in enumerate(settle):
    total, big = live_mb()
    log(exp="r12_bw512_steps", run=f"pre_step{i}", live_total_mb=total,
        big=big, settle_s=pause)
    if pause:
        time.sleep(pause)
    try:
        t0 = time.time()
        c = jnp.float32(float(step(c)))
        log(exp="r12_bw512_steps", run=f"step{i}",
            s=round(time.time() - t0, 2))
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r12_bw512_steps", run=f"step{i}",
            error=f"{type(e).__name__}: {e}"[:300])
        # keep going: later steps test whether a settle delay recovers
        continue
log(exp="r12_bw512_steps", run="done")
