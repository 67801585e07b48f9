"""Round-4 sweep 3: dead-row skip in the sorted VJP + big blocks.
Appends to experiments/r4_sorted_march_results.jsonl."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_sorted_march_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig, render
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


VOL, IMG, MS, TF_RES, SR = 256, 512, 512, 128, 1.0
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)


def make(cfg):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


base = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                    max_samples=MS, march_table="super64")
srt = base.replace(march_vjp="sorted")

runs = [
    ("ds_sorted_b64_w256k", srt.replace(block_size=64,
                                        vjp_window_rows=1 << 18)),
    ("ds_sorted_b128_w256k", srt.replace(block_size=128,
                                         vjp_window_rows=1 << 18)),
    ("ds_sorted_b64_w256k_e128k", srt.replace(block_size=64,
                                              vjp_window_rows=1 << 18,
                                              vjp_box_rows=1 << 17)),
    ("ds_sorted_b128_w512k", srt.replace(block_size=128,
                                         vjp_window_rows=1 << 19)),
    ("ds_analytic_sorted_b64_w256k", srt.replace(analytic_normals=True,
                                                 block_size=64,
                                                 vjp_window_rows=1 << 18)),
]

for name, cfg in runs:
    try:
        t = chain(make(cfg), n=1, args=(vol, tf))
        log(exp="r4_sorted_march", run=name, mode="grad",
            group=cfg.supercell_group(SR), block=cfg.block_size,
            skip=cfg.ert_block_skip, wrows=cfg.vjp_window_rows,
            brows=cfg.vjp_box_rows, s=round(t, 4))
    except Exception as e:
        log(exp="r4_sorted_march", run=name,
            error=f"{type(e).__name__}: {e}"[:300])
print("done", flush=True)
