"""Round-4: sorted-window march VJP at the headline config, on TPU.

exp_r4_sortbwd.py measured the assembled sorted-window placement at 29.4
ns/row vs 207.6 for the big-table AD scatter.  This wires the real thing
(march_vjp="sorted") and measures, at 256^3 / 512^2 / 512 steps / sr=1:

  parity  fwd+bwd: ad (round-3 headline 4.50 s) vs sorted, block/window
          sweeps; plus skip off as a memory/cond control
  analytic fwd+bwd: ad (round-3 4.73 s) vs sorted

Honest chained protocol (CLAUDE.md rule 4).  Appends to
experiments/r4_sorted_march_results.jsonl.
"""
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


def make(cfg, mode):
    if mode == "grad":
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(
                render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
                argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0
    else:
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render(v, t, lf, cfg, sampling_rate=SR).image
            return c + 1 + img.sum() * 0
    return f


base = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                    max_samples=MS, march_table="super64")
srt = base.replace(march_vjp="sorted")

runs = [
    ("parity_sorted_b16_skip", srt.replace(block_size=16), "grad"),
    ("parity_sorted_b16_w64k", srt.replace(block_size=16,
                                           vjp_window_rows=1 << 16), "grad"),
    ("parity_sorted_b16_w256k", srt.replace(block_size=16,
                                            vjp_window_rows=1 << 18),
     "grad"),
    ("parity_sorted_b32_skip", srt.replace(block_size=32), "grad"),
    ("parity_sorted_b16_noskip", srt.replace(block_size=16,
                                             ert_block_skip=False), "grad"),
    ("analytic_sorted_b16_skip", srt.replace(analytic_normals=True,
                                             block_size=16), "grad"),
    ("parity_ad_b16_skip_ref", base.replace(block_size=16), "grad"),
]

for name, cfg, mode in runs:
    grp = cfg.supercell_group(SR)
    try:
        t = chain(make(cfg, mode), n=(1 if mode == "grad" else 2),
                  args=(vol, tf))
        log(exp="r4_sorted_march", run=name, mode=mode, group=grp,
            block=cfg.block_size, skip=cfg.ert_block_skip,
            wrows=cfg.vjp_window_rows, brows=cfg.vjp_box_rows,
            s=round(t, 4))
    except Exception as e:
        log(exp="r4_sorted_march", run=name,
            error=f"{type(e).__name__}: {e}"[:300])
