"""Round-14: attribute the MONOLITHIC 1.52 s headline fwd+bwd (256^3/512^2
/512, sorted VJP b64) to its backward stages, by ablation.

The split-blockwise breakdown (exp_r13) gives per-phase times with syncs
(fwd 1.40, cot 1.48, fold 0.43, place 1.91, fin 0.03 — total 5.28 s) but
the monolith overlaps everything into 1.52 s, so the split ratios do not
transfer.  Here each arm re-traces the SAME monolithic grad program with
one stage monkeypatched to a cheap shape-correct stand-in that still
depends on its inputs (so XLA cannot dead-code the upstream stages):

  control   — unpatched headline step
  no_place  — _sorted_volume_grad -> full(vol_shape, sum(d_rows)*1e-30)
              (fold still runs; Δ vs control = sort+scatter placement)
  no_fold   — _super_bwd_rows -> shaped zeros + sum(cot)*1e-30, placement
              still runs on the zero rows (price is data-independent);
              Δ vs control = the hat-weight fold arithmetic
  neither   — both patches (sanity: control - place - fold)

Also logs nominal vs ERT-effective marched samples (the roofline gap) and
re-runs exp_r11's Part B (packed depth-sorted vs plain, both scenes) that
the r11 OOM cascade swallowed.

Chained-protocol timing (CLAUDE.md rule 4).  Appends to
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

import differender_tpu.sampling as S
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

REAL_PLACE = S._sorted_volume_grad
REAL_ROWS = S._super_bwd_rows


def fake_place(spec, base, d_rows):
    # Shape-correct, input-dependent (not DCE-able), no sort/scatter.
    return jnp.full(spec.volume_shape, jnp.sum(d_rows) * 1e-30, jnp.float32)


def fake_rows(volume_shape, delta, parity, group, px, py, pz, cot,
              base_of=jnp.floor):
    K, N = px.shape
    kg = K // group
    Mg = kg * N
    d_int, (d_gx, d_gy, d_gz) = cot
    probe = (jnp.sum(d_int) + jnp.sum(d_gx) + jnp.sum(d_gy)
             + jnp.sum(d_gz)) * 1e-30
    zb = jnp.zeros((kg, N), jnp.int32)
    d_rows = jnp.zeros((Mg, 64), jnp.float32) + probe
    return zb, zb, zb, d_rows


def grad_step(render_fn, cfg_, **kw):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render_fn(v_, t_, lf, cfg_, sampling_rate=SR, **kw).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


def chain(f, n, *args):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


def run(name, f, *args, n=2):
    try:
        t0 = time.time()
        samples = chain(f, n, *args)
        log(exp="r14_ablate", run=name,
            first_s=round(time.time() - t0 - sum(samples), 1),
            samples=samples)
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r14_ablate", run=name,
            error=f"{type(e).__name__}: {e}"[:300])


ARMS = [
    ("control", REAL_PLACE, REAL_ROWS),
    ("no_place", fake_place, REAL_ROWS),
    ("no_fold", REAL_PLACE, fake_rows),
    ("neither", fake_place, fake_rows),
]
for name, place, rows in ARMS:
    S._sorted_volume_grad = place
    S._super_bwd_rows = rows
    try:
        run(name, grad_step(render, cfg), vol_noise, tf)
    finally:
        S._sorted_volume_grad = REAL_PLACE
        S._super_bwd_rows = REAL_ROWS

# Roofline gap: nominal vs ERT-effective marched samples on this scene.
try:
    from differender_tpu.geometry import make_rays

    @jax.jit
    def _ns(v, t, lf):
        rays = make_rays(lf, cfg, SR)
        nominal = jnp.sum(jnp.minimum(rays.n_samples, MS))
        eff = jnp.sum(render(v, t, lf, cfg, sampling_rate=SR).valid_steps)
        return nominal, eff

    nom, eff = _ns(vol_noise, tf, jnp.asarray(lf0))
    log(exp="r14_ablate", run="samples", nominal=int(nom), ert=int(eff),
        ratio=round(float(eff) / float(nom), 4))
except Exception as e:  # noqa: BLE001
    log(exp="r14_ablate", run="samples", error=f"{type(e).__name__}: {e}"[:300])

# exp_r11 Part B, re-run: packed depth-sorted vs plain on both scenes.
ds4 = lambda *a, **k: render_depth_sorted(*a, chunks=4, **k)  # noqa: E731
run("packed_ds4_phantom", grad_step(ds4, cfg), vol_phantom, tf)
run("packed_ds4_noise", grad_step(ds4, cfg), vol_noise, tf)
log(exp="r14_ablate", run="done")
