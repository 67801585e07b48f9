"""Round-3: wavefront compaction at the sr=16 workloads (TPU)."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_compaction_results.jsonl")
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
noise = jnp.asarray(np.random.default_rng(0).random((VOL,) * 3, np.float32) * 0.5)
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)


def run(name, v, img, sr, compact, n=1, block=32, strips=0):
    cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(img, img),
                       max_samples=512, block_size=block,
                       march_table="super64", analytic_normals=True,
                       nondiff_compaction=compact)

    if strips:
        @jax.jit
        def f(c, v_, t_):
            lf = jnp.asarray(lf0) + c * 1e-6
            im = render_nondiff_strips(v_, t_, lf, cfg, sampling_rate=sr,
                                       n_strips=strips).image
            return c + 1 + im.sum() * 0
    else:
        @jax.jit
        def f(c, v_, t_):
            lf = jnp.asarray(lf0) + c * 1e-6
            im = render_nondiff(v_, t_, lf, cfg, sampling_rate=sr).image
            return c + 1 + im.sum() * 0
    try:
        t = chain(f, n=n, args=(v, tf))
        log(exp="r3_compaction", run=name, img=img, sr=sr, compact=compact,
            s=round(t, 4))
        return t
    except Exception as e:
        log(exp="r3_compaction", run=name, img=img, sr=sr, compact=compact,
            error=f"{type(e).__name__}: {e}"[:300])


run("sr16_512_compact", vol, 512, 16.0, True)
run("sr16_800_strips_compact", vol, 800, 16.0, True, strips=4)
run("sr16_800_whole_compact", vol, 800, 16.0, True, strips=0)
run("sr4_512_compact", vol, 512, 4.0, True, n=2)
run("sr1_512_compact_noise", noise, 512, 1.0, True, n=2)
run("sr1_512_nocompact_noise", noise, 512, 1.0, False, n=2)
