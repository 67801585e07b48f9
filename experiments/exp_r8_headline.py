"""Round-4 headline experiments: scene robustness + sub-1s candidates.

Measured at the headline config (256^3 vol, 512^2 img, 512 samples):

  depth_sorted_{phantom,noise}   fwd+bwd through render_depth_sorted
      (chunks 4/8) vs the plain render numbers (BENCH_r03: noise 1.52 s,
      phantom 2.47 s — the global ERT block skip waits for the deepest
      ray; depth-grouped chunks let each group's skip fire at its own
      depth).  VERDICT r3 item 2.
  plain_{phantom,noise}          same-session controls (chip/day drift).
  s2_noise                       march_table=super64s2 at 256^3 (8x fewer
      distinct bases -> fewer sorted windows in the VJP).  VERDICT item 3.
  g4_noise                       sorted VJP at supercell group 4 via
      sampling_rate knob is fixed; instead vary vjp window 32k (control
      re-sweep at the new code state).

Chained-protocol timing (CLAUDE.md rule 4); arrays as jit args (rule 2).
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
from differender_tpu.render import render, render_depth_sorted
from differender_tpu.transfer import get_tf
from differender_tpu.utils.scenes import ct_phantom


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR = 256, 512, 512, 1.0
key = jax.random.PRNGKey(0)
vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
vol_phantom = jnp.asarray(ct_phantom(VOL))
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted")


def chain(f, n, *args):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


def grad_step(render_fn, cfg_):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render_fn(v_, t_, lf, cfg_, sampling_rate=SR).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


def run(name, f, *args, n=2):
    try:
        t0 = time.time()
        samples = chain(f, n, *args)
        log(exp="r8_headline", run=name, first_s=round(time.time() - t0
                                                       - sum(samples), 1),
            samples=samples)
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r8_headline", run=name, error=f"{type(e).__name__}: {e}"[:300])


# Same-session controls first.
plain = grad_step(render, cfg)
run("plain_noise", plain, vol_noise, tf)
run("plain_phantom", plain, vol_phantom, tf)

# Depth-sorted chunked diff path (grad THROUGH the host-composed function:
# at 256^3 the combined graph compiles fine; chunking is for ERT
# scheduling, not compile size).
for chunks in (4, 8):
    def ds_render(v, t, lf, cfg_, sampling_rate, _c=chunks):
        return render_depth_sorted(v, t, lf, cfg_,
                                   sampling_rate=sampling_rate, chunks=_c)

    f = grad_step(ds_render, cfg)
    run(f"depth_sorted{chunks}_phantom", f, vol_phantom, tf)
    if chunks == 4:
        run(f"depth_sorted{chunks}_noise", f, vol_noise, tf)

# Stride-2 table at 256^3 (VERDICT item 3 candidate).
cfg_s2 = cfg.replace(march_table="super64s2")
run("s2_noise", grad_step(render, cfg_s2), vol_noise, tf)

# Sorted-window re-sweep at the current code state: window 32k control.
cfg_w32 = cfg.replace(vjp_window_rows=1 << 15)
run("w32k_noise", grad_step(render, cfg_w32), vol_noise, tf)
log(exp="r8_headline", run="done")
