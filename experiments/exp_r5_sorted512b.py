"""Round-5 follow-up: 512^3 sorted-VJP bisect, part 2.

Part 1 (r5_sorted512_results.jsonl) showed the PLACEMENT loop alone
compiles and runs at exact 512^3-s2 shapes (96.8 s compile, 0.65 s/exec)
— so the HTTP-500 helper crash on the full sorted backward is the
COMBINED program (march backward + placement in one jit), and strips4
(M/4 rows per program) did not shrink it enough.  Two remaining knobs:

  strips16        per-strip M = 524k rows (16x smaller march program,
                  32 -> 8 placement passes at window 64k).  If the crash
                  is per-program march size, this unblocks it.
  strips4_small   strips4 with box_rows 64k + window 16k: 4x smaller
                  boxes and slices, in case the helper dies planning the
                  (256k, 64) box + its scatter at 512^3 buffer pressure.

If either compiles, time it against the 9.82 s AD number
(r3_s2_results.jsonl) and ship the winning config as the documented
512^3 gradient recipe.  Chained-protocol timing (CLAUDE.md rule 4);
arrays as jit args (rule 2).
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
from differender_tpu.render import render_strips
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def run(name, fn, *args, reps=2):
    try:
        t0 = time.time()
        c = jnp.float32(float(fn(jnp.float32(0.0), *args)))
        compile_s = time.time() - t0
        samples = []
        for _ in range(reps):
            t0 = time.time()
            c = jnp.float32(float(fn(c, *args)))
            samples.append(round(time.time() - t0, 4))
        log(exp="r5_sorted512b", run=name, compile_s=round(compile_s, 1),
            samples=samples)
        return True
    except Exception as e:  # noqa: BLE001 — record and continue the bisect
        log(exp="r5_sorted512b", run=name,
            error=f"{type(e).__name__}: {e}"[:300])
        return False


VOL, IMG = 512, 512
rng = np.random.default_rng(0)
vol = rng.standard_normal((VOL,) * 3, dtype=np.float32) * 0.1 + 0.3
tf = np.asarray(get_tf("tf1", 128), np.float32)
lf0 = np.array([1.5, 1.0, 2.5], np.float32)


def make_step(cfg, n_strips):
    def strip_step(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(render_strips(
            v_, t_, lf, cfg, sampling_rate=1.0,
            n_strips=n_strips).image ** 2), argnums=(0, 1))(v, t)
        return c + 1 + g[0].ravel()[0] * 0
    return strip_step


vj, tj = jnp.asarray(vol), jnp.asarray(tf)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=512, block_size=64, march_vjp="sorted")
assert cfg.resolved_march_table() == "super64s2", cfg.resolved_march_table()

ok16 = run("strips16_sorted", make_step(cfg, 16), vj, tj, reps=2)
if not ok16:
    cfg_small = cfg.replace(vjp_box_rows=1 << 16, vjp_window_rows=1 << 14)
    run("strips4_smallbox", make_step(cfg_small, 4), vj, tj, reps=2)

# AD reference at the same strip decomposition, for a like-for-like
# comparison if a sorted config lands.
run("strips16_ad_ref", make_step(cfg.replace(march_vjp="ad"), 16), vj, tj,
    reps=1)
log(exp="r5_sorted512b", run="done")
