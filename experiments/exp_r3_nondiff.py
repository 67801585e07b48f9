"""Round-3: empty-space-skipped nondiff inference at the reference's
flagship workload (sampling_rate 16; `render_nondiff.py:20,27`).

Measures on TPU:
  1. 512^2 sr=16 with and without the occupancy jump (round-2: 45.5 s);
  2. 800^2 sr=16 via strip rendering (round-2: crashed the worker);
  3. the headline nondiff config (sr=1) sanity check with skipping.
Scene: a CT-like structured phantom (sphere shell + inclusions) — empty
space skipping is content-dependent, and the reference's workload is CT;
the uniform-noise 'timing' volume (NO empty space: zero skip benefit) is
measured too as the adversarial bound.
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_nondiff_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig, render_nondiff, render_nondiff_strips
from differender_tpu.occupancy import build_occupancy
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
print("devices:", jax.devices(), flush=True)

xs = np.linspace(-1, 1, VOL, dtype=np.float32)
gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
rr = np.sqrt(gx * gx + gy * gy + gz * gz)
phantom = (0.8 / (1.0 + np.exp((rr - 0.55) * 40.0))       # soft body
           + 0.2 * ((rr > 0.62) & (rr < 0.68))            # shell ("skull")
           + 0.5 * (np.sqrt((gx - 0.2) ** 2 + gy ** 2 + (gz + 0.1) ** 2)
                    < 0.15)).astype(np.float32)           # inclusion
phantom = np.clip(phantom, 0.0, 1.0)
noise = np.asarray(
    np.random.default_rng(0).random((VOL,) * 3, np.float32) * 0.5)

tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)


def make_nd(cfg, sr):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        img = render_nondiff(v, t, lf, cfg, sampling_rate=sr).image
        return c + 1 + img.sum() * 0
    return f


def run(name, scene, img, sr, skip, n=1, block=32):
    cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(img, img),
                       max_samples=512, block_size=block,
                       march_table="super64", analytic_normals=True,
                       occupancy_skip=skip)
    v = jnp.asarray(phantom if scene == "phantom" else noise)
    try:
        t = chain(make_nd(cfg, sr), n=n, args=(v, tf))
        log(exp="r3_nondiff", run=name, scene=scene, img=img, sr=sr,
            skip=skip, s=round(t, 4))
        return t
    except Exception as e:
        log(exp="r3_nondiff", run=name, scene=scene, img=img, sr=sr,
            skip=skip, error=f"{type(e).__name__}: {e}"[:300])
        return None


# 1. 512^2 sr=16
run("sr16_512_skip", "phantom", 512, 16.0, True)
run("sr16_512_noskip", "phantom", 512, 16.0, False)
run("sr16_512_skip_noise", "noise", 512, 16.0, True)

# 2. 800^2 sr=16, strips (the reference workload)
for scene in ("phantom",):
    for strips in (4, 8):
        cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(800, 800),
                           max_samples=512, block_size=32,
                           march_table="super64", analytic_normals=True)
        v = jnp.asarray(phantom)

        def f800(c, v_, t_, strips=strips, cfg=cfg):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render_nondiff_strips(v_, t_, lf, cfg, sampling_rate=16.0,
                                        n_strips=strips).image
            return c + 1 + img.sum() * 0

        try:
            t = chain(f800, n=1, args=(v, tf))
            log(exp="r3_nondiff", run=f"sr16_800_strips{strips}",
                scene=scene, img=800, sr=16.0, skip=True, s=round(t, 4))
            break
        except Exception as e:
            log(exp="r3_nondiff", run=f"sr16_800_strips{strips}",
                scene=scene, img=800, sr=16.0, skip=True,
                error=f"{type(e).__name__}: {e}"[:300])

# 3. headline nondiff sr=1 with/without skip (regression guard)
run("sr1_512_skip", "noise", 512, 1.0, True, n=2)
run("sr1_512_noskip", "noise", 512, 1.0, False, n=2)
run("sr1_512_skip_phantom", "phantom", 512, 1.0, True, n=2)
