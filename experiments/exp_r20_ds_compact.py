"""Round-20: combine the two scene-adaptive diff-path mechanisms on the
structured (CT-phantom) scene — depth-sorted ray chunks (each chunk's ERT
block skip fires at its own depth) WITH alive-ray compaction inside each
chunk (rays that saturate early inside a chunk stop costing lanes).

Motivation: the round-16 sweep measured the mechanisms separately with
opposite win conditions (noise: compaction 1.06 s, depth-sort 2.13 s;
phantom: depth-sort 2.07 s, compaction 2.69 s).  Depth sorting groups rays
of similar USEFUL depth, but within a chunk saturation times still vary —
compaction may stack.  `render_depth_sorted` already threads the full
config into each chunk program, so `config.compact_after` composes for
free; this measures whether it pays.

One arm per invocation (r15 lesson: a RESOURCE_EXHAUSTED poisons the
process); drive with:

    for a in ds4_ctl ds4_c2_8 ds4_c2_4 ds8_ctl ds8_c2_8; do
        timeout 1200 python experiments/exp_r20_ds_compact.py $a; done

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

from differender_tpu.config import RenderConfig
from differender_tpu.render import render_depth_sorted
from differender_tpu.transfer import get_tf
from differender_tpu.utils.scenes import ct_phantom


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR = 256, 512, 512, 1.0
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

ARMS = {
    # name: (chunks, compact_after, compact_prefix)
    "ds4_ctl": (4, 0, 0.25),
    "ds4_c2_8": (4, 2, 0.125),
    "ds4_c2_4": (4, 2, 0.25),
    "ds8_ctl": (8, 0, 0.25),
    "ds8_c2_8": (8, 2, 0.125),
    "ds4_c1_4": (4, 1, 0.25),
}

arm = sys.argv[1]
chunks, ca, cp = ARMS[arm]

vol = jnp.asarray(ct_phantom(VOL))
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted",
                   compact_after=ca, compact_prefix=cp)


def loss(v, t, c):
    lf = jnp.asarray(lf0) + c * 1e-6
    out = render_depth_sorted(v, t, lf, cfg, sampling_rate=SR,
                              chunks=chunks)
    return jnp.mean(out.image ** 2)


# ONE outer jit over all chunks (the r14 form that measured 2.07 s): the
# un-jitted host-level multi-program form enqueues every chunk's
# forward+backward transients at once and RESOURCE_EXHAUSTs at this scale
# (r11 packed_ds4 rows, r20 ds4_ctl/ds4_c2_8 rows) — the same enqueue-time
# allocation behavior as the 512^3 blockwise lesson (CLAUDE.md).  Under
# one jit XLA schedules the chunks' buffers sequentially.
grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))

try:
    t0 = time.time()
    g = grad_fn(vol, tf, jnp.float32(0.0))
    jax.block_until_ready(g)
    first = time.time() - t0
    samples = []
    # Carry the returned scalar itself into look_from each iteration
    # (ADVICE r4: the carry VALUE flows from the prior step — same honest
    # chain as bench.py — computed before the timer starts; rule 4).
    c = jnp.float32(0.0)
    for i in range(1, 3):
        c = jnp.float32(float(c) + 1.0 + float(g[0].ravel()[0]) * 0.0)
        t0 = time.time()
        g = grad_fn(vol, tf, c)
        jax.block_until_ready(g)
        samples.append(round(time.time() - t0, 4))
    log(exp="r20_ds_compact", run=arm, chunks=chunks, compact_after=ca,
        compact_prefix=cp, first_s=round(first, 1), samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r20_ds_compact", run=arm, chunks=chunks, compact_after=ca,
        compact_prefix=cp, error=f"{type(e).__name__}: {e}"[:300])
