"""Round-16: measure the alive-compacted diff march (config.compact_after)
at the headline config (256^3 / 512^2 / 512, sorted VJP b64).

One arm per INVOCATION (sys.argv[1]) — r15's box sweep showed a single
RESOURCE_EXHAUSTED poisons the rest of the process (and loop variables
held Part A's 1.1 GB alive while the headline grad program sits at the
HBM edge), so every arm gets a fresh process; drive with:

    for a in ctl c1_8 c2_8 c2_4 c1_4 fwd_c1_8 phantom_c1_8; do
        timeout 1200 python experiments/exp_r16_compact.py $a; done

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
from differender_tpu.utils.scenes import ct_phantom


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR = 256, 512, 512, 1.0
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

ARMS = {
    # name: (mode, scene, compact_after, compact_prefix)
    "ctl": ("grad", "noise", 0, 0.25),
    "c1_8": ("grad", "noise", 1, 0.125),
    "c2_8": ("grad", "noise", 2, 0.125),
    "c2_4": ("grad", "noise", 2, 0.25),
    "c1_4": ("grad", "noise", 1, 0.25),
    "fwd_ctl": ("fwd", "noise", 0, 0.25),
    "fwd_c1_8": ("fwd", "noise", 1, 0.125),
    "phantom_ctl": ("grad", "phantom", 0, 0.25),
    "phantom_c1_8": ("grad", "phantom", 1, 0.125),
    "phantom_c2_4": ("grad", "phantom", 2, 0.25),
    # round 2 of the sweep (c2_8 led round 1 at 1.10 s vs 1.52 ctl):
    "c3_8": ("grad", "noise", 3, 0.125),
    "c2_16": ("grad", "noise", 2, 0.0625),
    "c3_16": ("grad", "noise", 3, 0.0625),
    "fwd_c2_8": ("fwd", "noise", 2, 0.125),
    "phantom_c2_8": ("grad", "phantom", 2, 0.125),
    # round 3 (c2_16 led round 2 at 1.06 s): shorter full-width head via
    # block 32, and a smaller prefix.
    "c2_32": ("grad", "noise", 2, 0.03125),
    "b32c2_16": ("grad", "noise", 2, 0.0625, 32),
    "b32c3_16": ("grad", "noise", 3, 0.0625, 32),
    "b32c4_16": ("grad", "noise", 4, 0.0625, 32),
    "fwd_c2_16": ("fwd", "noise", 2, 0.0625),
}

arm = sys.argv[1]
spec = ARMS[arm]
mode, scene, ca, cp = spec[:4]
blk = spec[4] if len(spec) > 4 else 64

vol = (jnp.asarray(ct_phantom(VOL)) if scene == "phantom"
       else jax.random.uniform(jax.random.PRNGKey(0), (VOL,) * 3,
                               jnp.float32) * 0.5)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=blk, march_vjp="sorted",
                   compact_after=ca, compact_prefix=cp)

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

try:
    t0 = time.time()
    c = jnp.float32(float(f(jnp.float32(0.0), vol, tf)))
    first = time.time() - t0
    samples = []
    for _ in range(2):
        t0 = time.time()
        c = jnp.float32(float(f(c, vol, tf)))
        samples.append(round(time.time() - t0, 4))
    log(exp="r16_compact", run=arm, mode=mode, scene=scene,
        compact_after=ca, compact_prefix=cp,
        first_s=round(first - samples[0] if False else first, 1),
        samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r16_compact", run=arm, mode=mode, scene=scene,
        compact_after=ca, compact_prefix=cp,
        error=f"{type(e).__name__}: {e}"[:300])
