"""Round-17 (one arm per invocation, fresh process each — see exp_r16):

  box17 / box16 — the r15 box-extent sweep, re-run validly (r15's arms
    OOM'd because Part A's loop variables held 1.1 GB while the headline
    grad program sits at the HBM edge).  Now measured ON the compacted
    headline config (c2, prefix 1/16): the head's 2 full-width blocks
    still place 8.4M rows into the 2^18-row box; the scatter_grid pricing
    has cliffs at 131072 (14.4 ns/idx) and 16384 (7.1) rows.
  alive512 — alive-ray fraction vs march depth at the 512^3/512^2 bench
    scene (stride-2 table), to size blockwise-backward compaction.

Appends to experiments/r8_headline_results.jsonl.
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


lf0 = np.array([1.2, 0.8, 2.0], np.float32)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
arm = sys.argv[1]

if arm in ("box17", "box16"):
    box = {"box17": 1 << 17, "box16": 1 << 16}[arm]
    VOL, IMG, MS, SR = 256, 512, 512, 1.0
    vol = jax.random.uniform(jax.random.PRNGKey(0), (VOL,) * 3,
                             jnp.float32) * 0.5
    cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                       max_samples=MS, block_size=64, march_vjp="sorted",
                       compact_after=2, compact_prefix=0.0625,
                       vjp_box_rows=box)

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
        log(exp="r17_box", run=arm, box=box, first_s=round(first, 1),
            samples=samples)
    except Exception as e:  # noqa: BLE001
        log(exp="r17_box", run=arm, box=box,
            error=f"{type(e).__name__}: {e}"[:300])

elif arm == "alive512":
    VOL, IMG, MS, SR = 512, 512, 512, 1.0
    vol = jax.random.uniform(jax.random.PRNGKey(1), (VOL,) * 3,
                             jnp.float32) * 0.5
    cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                       max_samples=MS, block_size=64,
                       march_table="super64s2")

    @jax.jit
    def probe(v, t, lf):
        out = render(v, t, lf, cfg, sampling_rate=SR)
        vs = out.valid_steps.reshape(-1)
        fr = [jnp.mean((vs > s).astype(jnp.float32))
              for s in (64, 128, 192, 256)]
        return jnp.stack(fr)

    try:
        fr = np.asarray(probe(vol, tf, jnp.asarray(lf0)))
        log(exp="r17_alive512", run="noise",
            alive_after=dict(zip(("64", "128", "192", "256"),
                                 [round(float(x), 4) for x in fr])))
    except Exception as e:  # noqa: BLE001
        log(exp="r17_alive512", run="noise",
            error=f"{type(e).__name__}: {e}"[:300])
