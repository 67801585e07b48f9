"""Round-18: the 512^3/512^2 blockwise gradient step WITH host-level
alive-ray compaction (render.value_and_grad_blockwise, compact_after=2).

r17's alive profile at this scene: 47.6% of rays alive after 64 steps,
2.44% after 128, 0.01% after 192 — so a split after 2 blocks (128 steps)
buckets to P = N/16 and blocks 2..7 run at 1/16 width.  Baseline to beat:
8.8 s warm (uncompacted blockwise, r12 rows).

Appends to experiments/r5_sorted512_results.jsonl.
"""
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


VOL, IMG, MS, SR = 512, 512, 512, 1.0
BLOCK = int(os.environ.get("BW_BLOCK", "64"))
CA = int(os.environ.get("BW_CA", "2"))

vol = jax.random.uniform(jax.random.PRNGKey(1), (VOL,) * 3,
                         jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=BLOCK, march_vjp="sorted",
                   march_table="super64s2", compact_after=CA)


def loss_fn(out):
    return jnp.mean(out.image ** 2)


c = 0.0
for i in range(4):
    t0 = time.time()
    try:
        loss, (dv, dt) = value_and_grad_blockwise(
            vol, tf, jnp.asarray(lf0 + np.float32(c) * 1e-6), cfg, loss_fn)
        jax.block_until_ready(dv)
        s = time.time() - t0
        log(exp="r18_bw512_compact", run=f"step{i}", block=BLOCK,
            compact_after=CA, s=round(s, 2), loss=float(loss),
            dv_norm=float(jnp.abs(dv).max()))
        c += 1.0 + float(loss) * 0.0
    except Exception as e:  # noqa: BLE001
        log(exp="r18_bw512_compact", run=f"step{i}",
            error=f"{type(e).__name__}: {e}"[:300])
        break
log(exp="r18_bw512_compact", run="done")
