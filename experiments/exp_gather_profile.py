"""TPU ground-truth: gather throughput curves + exact-march ablations.

Round-1 memory has two CONFLICTING claims (55 ms flat per gather HLO vs
74 G elem/s random-gather throughput); the SoA march measurement (12.8 s
fwd for 1.07 G gathered elements) matches neither.  This experiment
measures, in one process (relay-congestion rule):

  1. jnp.take throughput: table size x index count x pattern
     (uniform random / sorted / march-realistic strided).
  2. Exact-march forward ablations at the bench config (diff path, no ERT
     early-exit noise): full / TF-stubbed / shade-stubbed / gather-stubbed /
     index-math-stubbed.  Differences attribute the per-sample cost.

Appends JSON lines to experiments/gather_profile_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "gather_profile_results.jsonl")

import jax                    # noqa: E402
import jax.numpy as jnp       # noqa: E402
import numpy as np            # noqa: E402

from differender_tpu import RenderConfig                     # noqa: E402
from differender_tpu.geometry import make_rays, march_params  # noqa: E402
from differender_tpu.render import (_eval_block_soa, _ray_soa,  # noqa: E402
                                    composite_block_soa)
from differender_tpu.sampling import (apply_tf_soa, corner_soa,  # noqa: E402
                                      tf_table8)
from differender_tpu.shading import shade_soa                 # noqa: E402
from differender_tpu.transfer import get_tf                   # noqa: E402


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def chain(f, n=2):
    c = f(jnp.float32(0.0))
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n):
        c = f(c)
    jax.block_until_ready(c)
    return (time.time() - t0) / n


def bench_take(table_n, idx_n, pattern, key):
    table = jax.random.uniform(key, (table_n,), jnp.float32)
    if pattern == "random":
        idx = jax.random.randint(key, (idx_n,), 0, table_n, jnp.int32)
    elif pattern == "sorted":
        idx = jnp.sort(jax.random.randint(key, (idx_n,), 0, table_n,
                                          jnp.int32))
    elif pattern == "march":
        # march-realistic: adjacent lanes stride by ~Z (x-major flat index
        # of neighboring pixels' samples), plus small jitter
        base = (jnp.arange(idx_n, dtype=jnp.int32) * 509) % table_n
        idx = (base + jax.random.randint(key, (idx_n,), 0, 8,
                                         jnp.int32)) % table_n
    else:
        raise ValueError(pattern)

    @jax.jit
    def f(c):
        i = (idx + c.astype(jnp.int32)) % table_n
        return c + 1 + jnp.take(table, i, axis=0).sum() * 0

    s = chain(f)
    log({"exp": "take", "table": table_n, "n": idx_n, "pattern": pattern,
         "s": round(s, 5), "gelem_per_s": round(idx_n / s / 1e9, 4)})


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # --- 1. take throughput grid -------------------------------------
    for table_n in (1024, 131072, 16 * 1024 * 1024):
        for idx_n in (1 << 20, 1 << 24, 1 << 27):
            for pattern in ("random", "sorted", "march"):
                try:
                    bench_take(table_n, idx_n, pattern, key)
                except Exception as e:
                    log({"exp": "take", "table": table_n, "n": idx_n,
                         "pattern": pattern, "error": repr(e)[:200]})
                    return  # device likely poisoned; stop

    # --- 2. march forward ablations ----------------------------------
    VOL, IMG, MS, TF_RES, SR, BLK = 256, 512, 512, 128, 1.0, 64
    cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                       max_samples=MS, block_size=BLK, analytic_normals=True)
    vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)

    def march_fwd(variant):
        n_steps = cfg.diff_march_steps(SR)
        block = BLK
        n_blocks = -(-n_steps // block)

        def run(volume, tf_, look_from):
            rays = make_rays(look_from, cfg, SR)
            params = march_params(rays)
            soa = _ray_soa(rays, params)
            vol_flat = volume.reshape(-1)
            tf8 = tf_table8(tf_)
            N = IMG * IMG
            sr = jnp.float32(SR)

            def block_fn(carry, s0):
                accs, cnt = carry
                steps = s0 + jnp.arange(block, dtype=jnp.int32)
                t = soa.t0[None] + steps[:, None].astype(jnp.float32) * soa.dt[None]
                px = rays.origin[0] + t * soa.dx[None]
                py = rays.origin[1] + t * soa.dy[None]
                pz = rays.origin[2] + t * soa.dz[None]
                if variant == "noidx":
                    intensity = px + py * 0.5 + pz * 0.25
                    gx, gy, gz = px * 0.1, py * 0.1, pz * 0.1
                else:
                    idx8, (wx, wy, wz) = corner_soa(cfg.volume_shape, px, py, pz)
                    if variant == "nogather":
                        vals = (idx8.astype(jnp.float32) * 1e-8)
                    else:
                        vals = jnp.take(vol_flat, idx8.reshape(-1),
                                        axis=0).reshape(idx8.shape)
                    intensity = jnp.sum(vals * (wx * wy * wz), axis=0)
                    dbx = 2.0 * np.float32(1.0) * 0  # placeholder not used
                    gx = jnp.sum(vals * wy * wz, axis=0) * 1e-3
                    gy = jnp.sum(vals * wx * wz, axis=0) * 1e-3
                    gz = jnp.sum(vals * wx * wy, axis=0) * 1e-3
                if variant == "notf":
                    r = g = b = intensity
                    a = intensity * 0.5
                else:
                    r, g, b, a = apply_tf_soa(tf8, intensity)
                if variant == "noshade":
                    alpha = a * 0.9
                    pr, pg, pb = r * alpha, g * alpha, b * alpha
                else:
                    pr, pg, pb, alpha = shade_soa(
                        px, py, pz, gx, gy, gz, r, g, b, a,
                        soa.dx[None], soa.dy[None], soa.dz[None],
                        rays.origin, sr, cfg, clamp_light=True)
                in_range = ((steps[:, None] < soa.n_samples[None])
                            & (steps[:, None] < cfg.max_samples))
                accs, cnt, _ = composite_block_soa(
                    accs, cnt, pr, pg, pb, alpha, in_range, cfg, ert=True)
                return (accs, cnt), None

            zero = jnp.zeros((N,), jnp.float32)
            (accs, cnt), _ = jax.lax.scan(
                block_fn, ((zero, zero, zero, zero), jnp.ones((N,), jnp.int32)),
                jnp.arange(n_blocks, dtype=jnp.int32) * block)
            return accs[0].sum() + accs[3].sum()

        @jax.jit
        def f(c):
            lf = jnp.asarray(lf0) + c * 1e-6
            return c + 1 + run(vol, tf, lf) * 0

        return f

    for variant in ("full", "notf", "noshade", "nogather", "noidx",
                    "nogather_notf"):
        v = variant
        if variant == "nogather_notf":
            # compose two stubs: measure residual (index math + composite)
            def make():
                base = march_fwd("nogather")
                return base
            pass
        try:
            if variant == "nogather_notf":
                continue
            s = chain(march_fwd(v))
            log({"exp": "march_fwd", "variant": v, "s": round(s, 4)})
        except Exception as e:
            log({"exp": "march_fwd", "variant": v, "error": repr(e)[:200]})
            return


if __name__ == "__main__":
    main()
