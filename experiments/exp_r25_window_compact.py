"""Round-25 (VERDICT r4 item 4): sorted-VJP window/box re-sweep UNDER
alive-ray compaction at the 256^3 headline.

vjp_window_rows=64k was chosen by the round-4 sweep at FULL ray width
(M = 4.2M rows/block); with compact_after=2 the tail blocks shrink to
M = 262k rows (P = N/16), where 64k windows mean only 4 passes — the
fixed-cost balance that picked 64k no longer holds a priori.  Also
re-checks box 2^17 at the compacted config (the r17 box sweep rows
predate the final compaction arm ordering).

One arm per invocation (r15 lesson); drive with:

    for a in w64k_ctl w32k w128k w16k b17_w64k; do
        timeout 1200 python experiments/exp_r25_window_compact.py $a; done

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
from differender_tpu.render import render
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR = 256, 512, 512, 1.0
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

ARMS = {
    # name: (window_rows, box_rows)
    "w64k_ctl": (1 << 16, 1 << 18),
    "w32k": (1 << 15, 1 << 18),
    "w128k": (1 << 17, 1 << 18),
    "w16k": (1 << 14, 1 << 18),
    "b17_w64k": (1 << 16, 1 << 17),
}

arm = sys.argv[1]
wr, br = ARMS[arm]

vol = jax.random.uniform(jax.random.PRNGKey(0), (VOL,) * 3,
                         jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted",
                   march_table="super64", compact_after=2,
                   compact_prefix=0.0625, vjp_window_rows=wr,
                   vjp_box_rows=br)


@jax.jit
def f(c, v, t):
    lf = jnp.asarray(lf0) + c * 1e-6
    g = jax.grad(lambda v_, t_: jnp.mean(
        render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
        argnums=(0, 1))(v, t)
    return c + 1 + g[0].sum() * 0


try:
    t0 = time.time()
    c = jnp.float32(float(f(jnp.float32(0.0), vol, tf)))
    first = time.time() - t0
    samples = []
    for _ in range(3):
        t0 = time.time()
        c = jnp.float32(float(f(c, vol, tf)))
        samples.append(round(time.time() - t0, 4))
    log(exp="r25_window_compact", run=arm, window_rows=wr, box_rows=br,
        first_s=round(first, 1), samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r25_window_compact", run=arm, window_rows=wr, box_rows=br,
        error=f"{type(e).__name__}: {e}"[:300])
