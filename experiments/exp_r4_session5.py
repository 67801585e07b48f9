"""Round-4 session 5: confirm the shipped defaults and refresh the ladder.

  * bench-identical headline + sr=16 runs on the NEW defaults (sorted VJP
    w64k; auto occupancy cell/md; block-aligned jumps — the alignment fix
    rounds each jump down to a block, worth re-measuring).
  * analytic vs parity FWD-only at block 64 (gradient sweeps show analytic
    2.6 s vs parity 1.5 s fwd+bwd — counterintuitive; is it the forward?).
  * the reference training recipe (256^3, 256^2, 1024 samples, 8 views,
    exact parity) through parallel.train_step_views with the sorted VJP
    (round 3 measured 22.3 s with the AD scatter).
  * 512^3 high-res ladder: parity fwd+bwd at 512^2 with march_vjp=sorted
    over the stride-2 table (round 3: 9.82 s with AD).
  * 1024^3 single-chip nondiff probe (flat march, analytic normals,
    256^2, occupancy) — the stretch-config volume on ONE v5e chip.

Appends to experiments/r4_session2_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_session2_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu import (RenderConfig, render, render_nondiff,
                             render_nondiff_strips)
from differender_tpu.transfer import get_tf
from differender_tpu.utils.scenes import ct_phantom


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain_samples(f, n, args=()):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


VOL, IMG, MS, TF_RES, SR = 256, 512, 512, 128, 1.0
key = jax.random.PRNGKey(0)
vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
vol_phantom = jnp.asarray(ct_phantom(VOL))
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)

cfg_exact = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                         max_samples=MS, block_size=16,
                         march_table="super64")
cfg_grad = cfg_exact.replace(block_size=64, march_vjp="sorted")


def make_grad(cfg):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


def make_fwd(cfg, sr=SR):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render(v, t, lf, cfg, sampling_rate=sr).image
        return c + 1 + img.sum() * 0
    return f


# 1. headline on shipped defaults
try:
    s = chain_samples(make_grad(cfg_grad), 3, args=(vol_noise, tf))
    log(exp="r4_session5", run="headline_defaults", samples=s,
        mean_s=round(sum(s) / len(s), 4))
except Exception as e:
    log(exp="r4_session5", run="headline_defaults",
        error=f"{type(e).__name__}: {e}"[:300])

# 2. analytic vs parity forward-only at block 64 (diagnosis)
for name, cfg in [
    ("fwd_parity_b64", cfg_exact.replace(block_size=64)),
    ("fwd_analytic_b64", cfg_exact.replace(block_size=64,
                                           analytic_normals=True)),
]:
    try:
        s = chain_samples(make_fwd(cfg), 2, args=(vol_noise, tf))
        log(exp="r4_session5", run=name, samples=s)
    except Exception as e:
        log(exp="r4_session5", run=name, error=f"{type(e).__name__}: {e}"[:300])

# 3. sr=16 on shipped defaults (bench protocol: occupancy built inline)
try:
    cfg = cfg_exact.replace(analytic_normals=True)

    @jax.jit
    def f512(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=16.0).image
        return c + 1 + img.sum() * 0

    s = chain_samples(f512, 1, args=(vol_phantom, tf))
    log(exp="r4_session5", run="sr16_512_defaults", samples=s)
    cfg800 = cfg.replace(image_shape=(800, 800))

    def f800(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff_strips(v, t, lf, cfg800, sampling_rate=16.0,
                                    n_strips=4).image
        return c + 1 + img.sum() * 0

    s = chain_samples(f800, 1, args=(vol_phantom, tf))
    log(exp="r4_session5", run="sr16_800_defaults", samples=s)
except Exception as e:
    log(exp="r4_session5", run="sr16_defaults",
        error=f"{type(e).__name__}: {e}"[:300])

# 4. reference recipe via train_step_views + sorted VJP
try:
    from differender_tpu.losses import mse_loss
    from differender_tpu.parallel import train_step_views
    from differender_tpu.utils.camera import in_circles

    cfg_r = RenderConfig(volume_shape=(256,) * 3, image_shape=(256, 256),
                         max_samples=1024, block_size=64,
                         march_table="super64", march_vjp="sorted")
    lfs = jnp.asarray(np.asarray(
        in_circles(np.linspace(0, 2 * np.pi, 8, endpoint=False),
                   y=0.8, dist=2.2), np.float32))
    tgts = jnp.zeros((8, 256, 256, 4), jnp.float32)

    def step(c, v, t):
        loss, (gv, gt) = train_step_views(
            mse_loss, v, t, lfs + c * 1e-6, tgts, cfg_r, sampling_rate=1.0)
        return c + 1 + gv.sum() * 0

    s = chain_samples(step, 1, args=(vol_phantom, tf))
    log(exp="r4_session5", run="recipe_8view_sorted", samples=s)
except Exception as e:
    log(exp="r4_session5", run="recipe_8view_sorted",
        error=f"{type(e).__name__}: {e}"[:300])

# 5. 512^3 parity fwd+bwd, sorted VJP over the stride-2 table
try:
    key5 = jax.random.PRNGKey(5)
    vol512 = jax.random.uniform(key5, (512,) * 3, jnp.float32) * 0.5
    cfg512 = RenderConfig(volume_shape=(512,) * 3, image_shape=(512, 512),
                          max_samples=1024, block_size=64,
                          march_vjp="sorted")
    log(exp="r4_session5", run="cfg512_table",
        table=cfg512.resolved_march_table())
    s = chain_samples(make_grad(cfg512), 1, args=(vol512, tf))
    log(exp="r4_session5", run="512_parity_sorted_fwdbwd", samples=s)
    del vol512
except Exception as e:
    log(exp="r4_session5", run="512_parity_sorted_fwdbwd",
        error=f"{type(e).__name__}: {e}"[:300])

# 6. 1024^3 single-chip nondiff probe
try:
    xs = np.linspace(-1, 1, 1024, dtype=np.float32)
    r2 = xs[:, None, None] ** 2 + xs[None, :, None] ** 2 + \
        xs[None, None, :] ** 2
    vol1k = jnp.asarray((np.exp(-np.abs(np.sqrt(r2) - 0.6) * 8.0) * 0.5
                         ).astype(np.float32))
    del r2
    cfg1k = RenderConfig(volume_shape=(1024,) * 3, image_shape=(256, 256),
                         max_samples=512, block_size=32,
                         march_table="flat", cell_gather=False,
                         analytic_normals=True)

    @jax.jit
    def f1k(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg1k, sampling_rate=1.0).image
        return c + 1 + img.sum() * 0

    s = chain_samples(f1k, 1, args=(vol1k, tf))
    log(exp="r4_session5", run="1024_nondiff_probe", samples=s)
except Exception as e:
    log(exp="r4_session5", run="1024_nondiff_probe",
        error=f"{type(e).__name__}: {e}"[:300])

log(exp="r4_session5", run="done")
