"""Cell-table march at the bench config, honest host-roundtrip timing."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "cell_march_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig, render, render_nondiff
from differender_tpu.transfer import get_tf

def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f: f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

def timed(f, *args, reps=2):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(reps):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / reps

VOL, IMG, MS, TF_RES, SR = 256, 512, 512, 128, 1.0
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (VOL,)*3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)

def make(cfg, mode):
    if mode == "grad":
        @jax.jit
        def f(c, vol, tf):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v, t: jnp.mean(
                render(v, t, lf, cfg, sampling_rate=SR).image ** 2),
                argnums=(0, 1))(vol, tf)
            return c + 1 + g[0].sum() * 1e-12 + g[1].sum() * 1e-12
    else:
        @jax.jit
        def f(c, vol, tf):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render(vol, tf, lf, cfg, sampling_rate=SR).image
            return c + 1 + img.sum() * 1e-12
    return f

for analytic in (True, False):
    for blk in ((64, 128, 32) if analytic else (32, 64)):
        cfg = RenderConfig(volume_shape=(VOL,)*3, image_shape=(IMG, IMG),
                           max_samples=MS, block_size=blk,
                           analytic_normals=analytic)
        tag = f"{'analytic' if analytic else 'parity'}/b{blk}"
        for mode in ("fwd", "grad"):
            try:
                s = timed(make(cfg, mode), vol, tf)
                log(exp="cell_march", tag=tag, mode=mode, s=round(s, 4))
            except Exception as e:
                log(exp="cell_march", tag=tag, mode=mode, error=repr(e)[:250])
