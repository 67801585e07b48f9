"""Round-15: shave the sorted-VJP placement (0.68 s of the 1.52 s headline
— exp_r14 ablation).

Part A — isolated prices of the placement's three components at the
per-block headline size (M = 4.2M rows): sort_key_val of (key, idx),
the (M, 64) payload take, and a windowed box scatter, each chained.

Part B — the box-extent sweep the round-3/4 tuning never ran: the sorted
window WR was swept (64k best) but the box E stayed at 2^18 rows (64 MB)
from the round-2 allocation-cliff measurement.  The scatter_grid pricing
(row_scatter_results.jsonl) shows W=64 scatter into a C=131072-row target
at 14.4 ns/idx vs C=16384 at 7.1 — two more cliffs BELOW the 2^18 box.
Smaller boxes pay more anchor-advance passes (S = ceil(C/E)) but cheaper
per-row scatters and less per-pass zero+fold traffic.

Chained protocol (CLAUDE.md rule 4).  Appends to
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

from differender_tpu.config import RenderConfig
from differender_tpu.render import render
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR = 256, 512, 512, 1.0
key = jax.random.PRNGKey(0)
vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

# ---- Part A: component prices at per-block size --------------------------
M = (1 << 22)            # 4.2M rows (~ the headline per-block row count)
CK = 256 * 256 * 256     # key range


def chain(f, n, *args):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


try:
    keys = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, CK, jnp.int32)
    rows = jax.random.uniform(jax.random.PRNGKey(2), (M, 64), jnp.float32)

    @jax.jit
    def f_sort(c, k):
        ks, pidx = jax.lax.sort_key_val(
            k + c.astype(jnp.int32) * 0, jnp.arange(M, dtype=jnp.int32))
        return c + 1 + (ks[0] + pidx[0]).astype(jnp.float32) * 0

    @jax.jit
    def f_take(c, k, r):
        pidx = (k + c.astype(jnp.int32) * 0) % M
        rs = jnp.take(r, pidx, axis=0)
        return c + 1 + rs[0, 0] * 0

    @jax.jit
    def f_sort_take(c, k, r):
        ks, pidx = jax.lax.sort_key_val(
            k + c.astype(jnp.int32) * 0, jnp.arange(M, dtype=jnp.int32))
        rs = jnp.take(r, pidx, axis=0)
        return c + 1 + (rs[0, 0] + ks[0].astype(jnp.float32)) * 0

    for name, f, args in (("sort", f_sort, (keys,)),
                          ("take", f_take, (keys, rows)),
                          ("sort_take", f_sort_take, (keys, rows))):
        s = chain(f, 3, *args)
        per = sum(s) / len(s)
        log(exp="r15_parts", run=name, M=M, s=round(per, 4),
            ns_per_row=round(per / M * 1e9, 2))
    del keys, rows
except Exception as e:  # noqa: BLE001
    log(exp="r15_parts", run="error", error=f"{type(e).__name__}: {e}"[:300])

# ---- Part B: box-extent sweep on the real headline step ------------------


def grad_step(cfg_):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render(v_, t_, lf, cfg_, sampling_rate=SR).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


SWEEP = [
    ("box17_w16", 1 << 17, 1 << 16),
    ("box16_w16", 1 << 16, 1 << 16),
    ("box15_w15", 1 << 15, 1 << 15),
    ("box17_w15", 1 << 17, 1 << 15),
]
for name, box, wr in SWEEP:
    cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                       max_samples=MS, block_size=64, march_vjp="sorted",
                       vjp_box_rows=box, vjp_window_rows=wr)
    try:
        t0 = time.time()
        samples = chain(grad_step(cfg), 2, vol_noise, tf)
        log(exp="r15_boxsweep", run=name, box=box, window=wr,
            first_s=round(time.time() - t0 - sum(samples), 1),
            samples=samples)
    except Exception as e:  # noqa: BLE001
        log(exp="r15_boxsweep", run=name, box=box, window=wr,
            error=f"{type(e).__name__}: {e}"[:300])
log(exp="r15_boxsweep", run="done")
