"""Round-26 (VERDICT r4 item 6 follow-up): Raycaster batched gradient
step, batch_mode='scan' vs 8 singles, at 256^3/256^2/512 — the largest
scale where the batched monolithic sorted-VJP program COMPILES (at
512^2 both scan and vmap crash the remote compile helper
deterministically, r24 rows; the reference's own recipe runs 256^2,
test_opt_tf.py:49).  Chained protocol.  Appends to
experiments/r8_headline_results.jsonl.
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r8_headline_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu.raycaster import Raycaster
from differender_tpu.transfer import get_tf_torch_layout

def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f: f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

VOL, IMG, MS, SR, BS = 256, 256, 512, 1.0, 8
arm = sys.argv[1]
vol = jax.random.uniform(jax.random.PRNGKey(0), (1, VOL, VOL, VOL),
                         jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf_torch_layout("tf1", 128), np.float32))
angles = np.linspace(0.0, 2 * np.pi, BS, endpoint=False)
lfs = np.stack([[np.cos(a) * 2.4, 0.8, np.sin(a) * 2.4] for a in angles]
               ).astype(np.float32)
rc = Raycaster((VOL, VOL, VOL), (IMG, IMG), 128, sampling_rate=SR,
               jitter=False, max_samples=MS, block_size=64,
               march_vjp="sorted", march_table="super64",
               batch_mode=("vmap" if arm == "vmap" else "scan"))

def loss(v, t, lf_x, c):
    img = rc.forward(v, t, jnp.asarray(lf_x) + c * 1e-6)
    return jnp.mean(img ** 2)

if arm in ("scan", "vmap"):
    @jax.jit
    def f(c, v, t):
        g = jax.grad(loss, argnums=(0, 1))(v, t, lfs, c)
        return c + 1 + g[0].sum() * 0
else:
    grad_1 = jax.jit(lambda c, v, t, lf_1: jax.grad(
        loss, argnums=(0, 1))(v, t, lf_1, c))
    def f(c, v, t):
        acc = None
        for i in range(BS):
            g = grad_1(c, v, t, jnp.asarray(lfs[i]))
            acc = g if acc is None else (acc[0] + g[0], acc[1] + g[1])
        return c + 1 + acc[0].sum() * 0

try:
    t0 = time.time()
    c = jnp.float32(float(f(jnp.float32(0.0), vol, tf)))
    jax.block_until_ready(c)
    first = time.time() - t0
    samples = []
    for _ in range(2):
        t0 = time.time()
        c = jnp.float32(float(f(c, vol, tf)))
        jax.block_until_ready(c)
        samples.append(round(time.time() - t0, 3))
    log(exp="r26_scan_256", run=arm, bs=BS, img=IMG,
        first_s=round(first, 1), samples=samples)
except Exception as e:  # noqa: BLE001
    log(exp="r26_scan_256", run=arm, bs=BS, img=IMG,
        error=f"{type(e).__name__}: {e}"[:300])
