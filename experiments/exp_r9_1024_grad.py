"""1024^3 sharded BACKWARD feasibility (VERDICT r3 item 7).

Round 3 demonstrated the 1024^3 stretch config forward-only
(exp_1024_feasibility.py: 223 s on the virtual 8-device CPU mesh).  This
runs a full gradient step at the same scale: MSE loss on the X-sharded
render, jax.grad AROUND the shard_map (the exact form —
tests/test_parallel.py), grads w.r.t. the sharded volume AND the
replicated TF, bounded per-shard segment window.

Memory math (per virtual device, transferable to a real v5p slice):
  shard 128x1024x1024 f32 = 512 MB, +2-voxel halos ~8 MB, volume grad
  another 512 MB, march residuals ~ image * window * 5 floats (tiny at
  16^2) — comfortably inside one v5p core's 96 GB HBM; the host here
  needs ~8 x 1 GB + optimizer-free transient.

Run:  python experiments/exp_r9_1024_grad.py   (CPU, ~minutes-scale)
Appends one JSON line to experiments/feasibility_1024_results.jsonl.
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from differender_tpu import RenderConfig  # noqa: E402
from differender_tpu.parallel import (render_volume_sharded,  # noqa: E402
                                      shard_volume)
from differender_tpu.transfer import get_tf  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__),
                   "feasibility_1024_results.jsonl")


def main():
    X = 1024
    mesh = Mesh(np.array(jax.devices()), ("space",))
    cfg = RenderConfig(volume_shape=(X, X, X), image_shape=(16, 16),
                       max_samples=256, block_size=16, tf_resolution=64,
                       analytic_normals=True)

    print("building 1024^3 volume (4 GiB f32)...", flush=True)
    xs = np.linspace(-1, 1, X, dtype=np.float32)
    vol_np = np.empty((X, X, X), np.float32)
    for i0 in range(0, X, 128):
        gx = xs[i0:i0 + 128][:, None, None]
        r = np.sqrt(gx * gx + xs[None, :, None] ** 2
                    + xs[None, None, :] ** 2)
        vol_np[i0:i0 + 128] = 1.0 / (1.0 + np.exp((r - 0.55) * 12.0))
    vol = shard_volume(jnp.asarray(vol_np), mesh)
    del vol_np
    tf = jnp.asarray(np.asarray(get_tf("tf1", 64)))
    lf = jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32))

    print("forward (target render)...", flush=True)
    t0 = time.time()
    target = render_volume_sharded(vol, tf, lf, cfg, mesh,
                                   sampling_rate=0.1,
                                   segment_max_samples=64).image
    target = jax.block_until_ready(target) * 0.9   # something to pull toward
    fwd_wall = time.time() - t0

    def loss_fn(v, t):
        img = render_volume_sharded(v, t, lf, cfg, mesh, sampling_rate=0.1,
                                    segment_max_samples=64).image
        return jnp.mean((img - target) ** 2)

    print("grad step...", flush=True)
    t0 = time.time()
    loss, (g_vol, g_tf) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        vol, tf)
    jax.block_until_ready((loss, g_vol, g_tf))
    grad_wall = time.time() - t0

    g_vol_absmax = float(jnp.abs(g_vol).max())
    g_tf_absmax = float(jnp.abs(g_tf).max())
    assert np.isfinite(float(loss))
    assert g_vol_absmax > 0.0 and np.isfinite(g_vol_absmax)
    assert g_tf_absmax > 0.0 and np.isfinite(g_tf_absmax)
    rec = {
        "exp": "grad_1024",
        "volume": [X, X, X],
        "shards": 8,
        "image": list(cfg.image_shape),
        "segment_max_samples": 64,
        "fwd_wall_s": round(fwd_wall, 2),
        "grad_step_wall_s": round(grad_wall, 2),
        "loss": float(loss),
        "g_vol_absmax": g_vol_absmax,
        "g_tf_absmax": g_tf_absmax,
        "per_shard_volume_mb": round(X // 8 * X * X * 4 / 2**20, 1),
        "per_shard_with_grad_mb": round(2 * X // 8 * X * X * 4 / 2**20, 1),
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
