"""Round-3: tune the high-rate nondiff march (block size x supercell group
x jump cadence) at the reference sr=16 workload.

With sr=16 the march step is ~0.027 voxels, so up to 64 consecutive
samples share one supercell row (supercell_group now tries 64..2); block
size sets the while-loop iteration count (per-iteration overhead is the
measured wall at this workload).
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_sr16_tune_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig, render_nondiff, render_nondiff_strips
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain(f, n, args=()):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(n):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / n


VOL, TF_RES = 256, 128
xs = np.linspace(-1, 1, VOL, dtype=np.float32)
gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
rr = np.sqrt(gx * gx + gy * gy + gz * gz)
phantom = np.clip(
    0.8 / (1.0 + np.exp((rr - 0.55) * 40.0))
    + 0.2 * ((rr > 0.62) & (rr < 0.68))
    + 0.5 * (np.sqrt((gx - 0.2) ** 2 + gy ** 2 + (gz + 0.1) ** 2) < 0.15),
    0.0, 1.0).astype(np.float32)
vol = jnp.asarray(phantom)
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)


def make_nd(cfg, sr=16.0):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=sr).image
        return c + 1 + img.sum() * 0
    return f


def cfg_for(block, jump_every=1, skip=True):
    return RenderConfig(volume_shape=(VOL,) * 3, image_shape=(512, 512),
                        max_samples=512, block_size=block,
                        march_table="super64", analytic_normals=True,
                        occupancy_skip=skip,
                        occupancy_jump_every=jump_every)


best = (None, 1e9)
for block in (32, 64, 128):
    cfg = cfg_for(block)
    grp = cfg.supercell_group(16.0)
    try:
        t = chain(make_nd(cfg), n=1, args=(vol, tf))
        log(exp="sr16_tune", block=block, group=min(grp, block),
            jump_every=1, s=round(t, 4))
        if t < best[1]:
            best = (block, t)
    except Exception as e:
        log(exp="sr16_tune", block=block,
            error=f"{type(e).__name__}: {e}"[:300])

if best[0] is not None:
    for je in (2, 4):
        cfg = cfg_for(best[0], jump_every=je)
        try:
            t = chain(make_nd(cfg), n=1, args=(vol, tf))
            log(exp="sr16_tune", block=best[0], jump_every=je, s=round(t, 4))
        except Exception as e:
            log(exp="sr16_tune", block=best[0], jump_every=je,
                error=f"{type(e).__name__}: {e}"[:300])
    # no-skip at the best block (isolate the occupancy contribution)
    cfg = cfg_for(best[0], skip=False)
    try:
        t = chain(make_nd(cfg), n=1, args=(vol, tf))
        log(exp="sr16_tune", block=best[0], skip=False, s=round(t, 4))
    except Exception as e:
        log(exp="sr16_tune", block=best[0], skip=False,
            error=f"{type(e).__name__}: {e}"[:300])
    # the full 800^2 reference workload via strips at the best block
    cfg800 = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(800, 800),
                          max_samples=512, block_size=best[0],
                          march_table="super64", analytic_normals=True)

    def f800(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff_strips(v, t, lf, cfg800, sampling_rate=16.0,
                                    n_strips=4).image
        return c + 1 + img.sum() * 0

    try:
        t = chain(f800, n=1, args=(vol, tf))
        log(exp="sr16_tune", run="800_strips4", block=best[0], s=round(t, 4))
    except Exception as e:
        log(exp="sr16_tune", run="800_strips4",
            error=f"{type(e).__name__}: {e}"[:300])
