"""TPU experiment: SoA exact-march performance at the bench config.

Measures fwd and fwd+bwd of the SoA march (analytic + parity modes) at
256^3 volume / 512^2 image / 512 steps across block sizes, with the honest
chained protocol (camera perturbed by the carried scalar each iteration).
Appends one JSON line per measurement to experiments/soa_march_results.jsonl
so partial progress survives crashes.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "soa_march_results.jsonl")

import jax                    # noqa: E402
import jax.numpy as jnp       # noqa: E402
import numpy as np            # noqa: E402

from differender_tpu import RenderConfig, render, render_nondiff  # noqa: E402
from differender_tpu.transfer import get_tf                        # noqa: E402

VOL, IMG, MAX_SAMPLES, TF_RES, SR = 256, 512, 512, 128, 1.0


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def chain_bench(f, n):
    c = f(jnp.float32(0.0))
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n):
        c = f(c)
    jax.block_until_ready(c)
    return (time.time() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)

    def make(cfg, mode):
        if mode == "grad":
            @jax.jit
            def f(c):
                lf = jnp.asarray(lf0) + c * 1e-6
                g = jax.grad(lambda v, t: jnp.mean(
                    render(v, t, lf, cfg, sampling_rate=SR).image ** 2),
                    argnums=(0, 1))(vol, tf)
                return c + 1 + g[0].sum() * 0
        else:
            @jax.jit
            def f(c):
                lf = jnp.asarray(lf0) + c * 1e-6
                img = render_nondiff(vol, tf, lf, cfg, sampling_rate=SR).image
                return c + 1 + img.sum() * 0
        return f

    for analytic in (True, False):
        blocks = (64, 128, 32) if analytic else (32, 64, 16)
        for blk in blocks:
            cfg = RenderConfig(volume_shape=(VOL,) * 3,
                               image_shape=(IMG, IMG),
                               max_samples=MAX_SAMPLES, block_size=blk,
                               analytic_normals=analytic)
            tag = f"{'analytic' if analytic else 'parity'}/b{blk}"
            try:
                t_fwd = chain_bench(make(cfg, "fwd"), 2)
                log({"exp": "soa", "tag": tag, "mode": "fwd_nondiff",
                     "s": round(t_fwd, 4)})
            except Exception as e:
                log({"exp": "soa", "tag": tag, "mode": "fwd_nondiff",
                     "error": repr(e)[:300]})
            try:
                t_g = chain_bench(make(cfg, "grad"), 2)
                log({"exp": "soa", "tag": tag, "mode": "fwd_bwd",
                     "s": round(t_g, 4)})
            except Exception as e:
                log({"exp": "soa", "tag": tag, "mode": "fwd_bwd",
                     "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
