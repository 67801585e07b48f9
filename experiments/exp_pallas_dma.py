"""Gating prototype for the fused Pallas march kernel (SURVEY §7 step 3).

Tests, on the real TPU, the two mechanisms the kernel design needs:

  A. dynamic-origin brick DMA HBM -> VMEM driven by scalar-prefetched
     indices:
       A1: origins aligned to (8, 8, 128)   — definitely-supported baseline
       A2: arbitrary (unaligned) origins    — the design-critical question
       A3: pre-bricked (NB, 32, 1024) row DMA — fallback if A2 fails
  B. the separable one-hot trilinear chain (weights -> MXU dots) inside the
     kernel, validated against the XLA oracle sampler.

Usage: python experiments/exp_pallas_dma.py [interpret]
Appends JSON to experiments/pallas_dma_results.jsonl.
"""
import json
import os
import sys
import time

INTERPRET = "interpret" in sys.argv[1:]

import jax

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "pallas_dma_results.jsonl")
B = 32          # brick edge
V = 256         # volume edge


# ---------------------------------------------------------------- kernel A
def brick_sum_kernel(origins_ref, vol_ref, out_ref, brick, sem):
    i = pl.program_id(0)
    x0 = origins_ref[i, 0]
    y0 = origins_ref[i, 1]
    z0 = origins_ref[i, 2]
    dma = pltpu.make_async_copy(
        vol_ref.at[pl.ds(x0, B), pl.ds(y0, B), pl.ds(z0, B)], brick, sem)
    dma.start()
    dma.wait()
    # full-array VMEM output (no blocking): one row per grid step
    out_ref[i, :] = jnp.full((128,), jnp.sum(brick[:]), jnp.float32)


def run_brick_sums(vol, origins):
    n = origins.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, B, B), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        brick_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(origins, vol)


def brick_row_kernel(idx_ref, bricks_ref, out_ref, brick, sem):
    i = pl.program_id(0)
    bi = idx_ref[i]
    dma = pltpu.make_async_copy(bricks_ref.at[bi], brick, sem)
    dma.start()
    dma.wait()
    out_ref[i, :] = jnp.full((128,), jnp.sum(brick[:]), jnp.float32)


def run_brick_rows(bricks, idx):
    n = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, B * B), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        brick_row_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(idx, bricks)


def time_call(f, *args, n_rep=3):
    o = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n_rep):
        o = jax.block_until_ready(f(*args))
    return (time.time() - t0) / n_rep, o


def main():
    recs = []
    rng = np.random.default_rng(0)
    vol_np = rng.random((V, V, V), np.float32)
    vol = jnp.asarray(vol_np)
    n = 64 if INTERPRET else 2048

    def expect(origins):
        return np.array([
            vol_np[x:x + B, y:y + B, z:z + B].sum() for x, y, z in
            np.asarray(origins)[: (16 if not INTERPRET else 64)]],
            np.float32)

    # A1 aligned
    try:
        al = rng.integers(0, (V - B) // 8, size=(n, 3)) * 8
        al[:, 2] = (al[:, 2] // 16) * 16   # lane dim coarser
        al = jnp.asarray(al.astype(np.int32))
        f = jax.jit(run_brick_sums)
        dt, out = time_call(f, vol, al)
        ok = np.allclose(np.asarray(out)[:16, 0], expect(al), rtol=1e-5)
        recs.append({"variant": "A1_aligned", "ok": bool(ok),
                     "n": n, "wall_s": round(dt, 4),
                     "us_per_visit": round(dt / n * 1e6, 3)})
    except Exception as e:
        recs.append({"variant": "A1_aligned",
                     "error": f"{type(e).__name__}: {e}"[:400]})
    print(json.dumps(recs[-1]), flush=True)

    # A2 unaligned
    try:
        un = jnp.asarray(rng.integers(0, V - B, size=(n, 3)).astype(np.int32))
        f = jax.jit(run_brick_sums)
        dt, out = time_call(f, vol, un)
        ok = np.allclose(np.asarray(out)[:16, 0], expect(un), rtol=1e-5)
        recs.append({"variant": "A2_unaligned", "ok": bool(ok),
                     "n": n, "wall_s": round(dt, 4),
                     "us_per_visit": round(dt / n * 1e6, 3)})
    except Exception as e:
        recs.append({"variant": "A2_unaligned",
                     "error": f"{type(e).__name__}: {e}"[:400]})
    print(json.dumps(recs[-1]), flush=True)

    # A3 pre-bricked rows
    try:
        nb = 16 if INTERPRET else 4096
        bricks = jnp.asarray(rng.random((nb, B, B * B), np.float32))
        idx = jnp.asarray(rng.integers(0, nb, size=(n,)).astype(np.int32))
        f = jax.jit(run_brick_rows)
        dt, out = time_call(f, bricks, idx)
        want = np.asarray(bricks)[np.asarray(idx)[:16]].sum(axis=(1, 2))
        ok = np.allclose(np.asarray(out)[:16, 0], want, rtol=1e-5)
        recs.append({"variant": "A3_bricked_rows", "ok": bool(ok),
                     "n": n, "wall_s": round(dt, 4),
                     "us_per_visit": round(dt / n * 1e6, 3)})
    except Exception as e:
        recs.append({"variant": "A3_bricked_rows",
                     "error": f"{type(e).__name__}: {e}"[:400]})
    print(json.dumps(recs[-1]), flush=True)

    with open(OUT, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
