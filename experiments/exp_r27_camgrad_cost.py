"""Round-27: cost of camera_grads=True on the shipped sorted VJP at the
256^3/512^2/512 headline (the round-5 feature: exact sample-position
cotangents re-derived against the saved table — one extra row gather per
block backward).  Control = same config, camera_grads=False.
Chained protocol.  Appends to experiments/r8_headline_results.jsonl.
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r8_headline_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu.config import RenderConfig
from differender_tpu.render import render
from differender_tpu.transfer import get_tf

def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f: f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

VOL = int(os.environ.get("R27_VOL", "256"))
IMG = int(os.environ.get("R27_IMG", "512"))
MS, SR = int(os.environ.get("R27_MS", "512")), 1.0
arm = sys.argv[1]                      # "cam" or "ctl"
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
vol = jax.random.uniform(jax.random.PRNGKey(0), (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
ca = 0 if arm == "cam_nc" else 2
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted",
                   compact_after=ca, compact_prefix=0.0625,
                   camera_grads=arm.startswith("cam"))

if arm.startswith("cam"):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_, l_: jnp.mean(
            render(v_, t_, l_, cfg, sampling_rate=SR).image ** 2),
            argnums=(0, 1, 2))(v, t, lf)
        return c + 1 + g[0].sum() * 0 + g[2].sum() * 0
else:
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
    log(exp="r27_camgrad", run=arm, vol=VOL, img=IMG, ms=MS, first_s=round(first, 1), samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r27_camgrad", run=arm, vol=VOL, img=IMG, ms=MS, error=f"{type(e).__name__}: {e}"[:300])
# Arm "cam_nc": camera_grads WITHOUT compaction (the 1.52 s plain sorted
# config) — isolates whether the crash is the position-VJP graph itself
# or its composition with the compacted march.
