"""Round-21: stride-2 supercell table (march_table='super64s2') at the
256^3 headline — VERDICT r3 item-3 candidate never measured at this scale.

The sorted-window march VJP keys its scatter windows on supercell BASE
indices; the stride-2 table has 8x fewer distinct bases than super64
(one base per 2-voxel-even corner), so windows repeat more and the
per-block cotangent sort has longer equal-key runs.  Whether that wins
over super64's narrower rows at 256^3 is an empirical question (at 512^3
super64s2 is forced — the full table exceeds the size gate).

One arm per invocation (r15 lesson); drive with:

    for a in s2_ctl s2_c2_16; do
        timeout 1200 python experiments/exp_r21_s2_headline.py $a; done

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
    # name: (compact_after, compact_prefix)
    "s2_ctl": (0, 0.25),
    "s2_c2_16": (2, 0.0625),
}

arm = sys.argv[1]
ca, cp = ARMS[arm]

vol = jax.random.uniform(jax.random.PRNGKey(0), (VOL,) * 3,
                         jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted",
                   march_table="super64s2", compact_after=ca,
                   compact_prefix=cp)


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
    for _ in range(2):
        t0 = time.time()
        c = jnp.float32(float(f(c, vol, tf)))
        samples.append(round(time.time() - t0, 4))
    log(exp="r21_s2", run=arm, compact_after=ca, compact_prefix=cp,
        first_s=round(first, 1), samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r21_s2", run=arm, compact_after=ca, compact_prefix=cp,
        error=f"{type(e).__name__}: {e}"[:300])
