"""Round-6: bisect WHICH blockwise program crashes the helper at 512^3.

The first exp_r5_blockwise512 run failed fast (HTTP 500 within ~150 s of
process start, both sorted AND ad) — before any 512^3-scale compile
could plausibly finish.  Two hypotheses:

  (a) eager make_rays at 512^2 emitted dozens of small remote compiles
      and congested the helper (CLAUDE.md rule 6) — now fixed by
      _blockwise_rays_program (ray setup is ONE jitted program);
  (b) one of the per-block programs genuinely exceeds the helper's
      buffer-pressure limit even though it holds a single block.

This script separates compile from execution with AOT lowering
(jax.ShapeDtypeStruct args -> .lower().compile()), so each of the three
programs (setup / fwd block / bwd block) is attributed individually.
If all compile, it runs the full chained-protocol step (rule 4).

Appends to experiments/r5_sorted512_results.jsonl (same ladder).
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r5_sorted512_results.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu.config import RenderConfig
from differender_tpu.render import (_blockwise_programs,
                                    _blockwise_rays_program, _RaySoA,
                                    value_and_grad_blockwise)
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG = 512, 512
N = IMG * IMG
f32 = jnp.float32
i32 = jnp.int32


def compile_one(name, fn, *arg_structs):
    try:
        t0 = time.time()
        lowered = fn.lower(*arg_structs)
        lower_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        log(exp="r6_bisect512", program=name, lower_s=round(lower_s, 1),
            compile_s=round(time.time() - t0, 1))
        return compiled
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r6_bisect512", program=name,
            error=f"{type(e).__name__}: {e}"[:300])
        return None


def sds(shape, dtype=f32):
    return jax.ShapeDtypeStruct(shape, dtype)


def bisect(cfg, tag):
    block = cfg.block_size
    setup = _blockwise_rays_program(cfg, 1.0, False)
    prep_vol, fwd_block, bwd_block, place_block = _blockwise_programs(
        cfg, 1.0, True, block)
    ok_setup = compile_one(f"{tag}_setup", setup, sds((3,)), sds((2,),
                           jnp.uint32))
    vol_sds = sds((VOL,) * 3)
    if prep_vol is not None:
        ok_prep = compile_one(f"{tag}_prep_vol", prep_vol, vol_sds)
        tbl_sds = jax.eval_shape(prep_vol, vol_sds)
    else:
        ok_prep, tbl_sds = True, None
    soa = _RaySoA(dx=sds((N,)), dy=sds((N,)), dz=sds((N,)), t0=sds((N,)),
                  dt=sds((N,)), n_samples=sds((N,), i32))
    accs = (sds((N,)),) * 4
    fwd_args = (vol_sds, sds((128, 4)), tbl_sds, soa, sds((3,)), accs,
                sds((N,), i32), sds((), i32))
    ok_fwd = compile_one(f"{tag}_fwd_block", fwd_block, *fwd_args)
    if place_block is not None:
        # Split backward: attribute the cotangent, fold, and placement
        # programs separately (bwd_cot drops the volume arg).
        ok_cot = compile_one(f"{tag}_bwd_cot", bwd_block, sds((128, 4)),
                             tbl_sds, soa, sds((3,)), accs,
                             sds((N,), i32), sds((), i32), accs)
        cots_sds = sds((4, block, N))
        ok_fold = compile_one(f"{tag}_fold", place_block.fold_block, soa,
                              sds((3,)), sds((), i32), cots_sds)
        if ok_fold is not None:
            base_sds, rows_sds = jax.eval_shape(
                place_block.fold_block, soa, sds((3,)), sds((), i32),
                cots_sds)
            ok_place = compile_one(f"{tag}_place", place_block.place_rows,
                                   vol_sds, base_sds, rows_sds)
        else:
            ok_place = None
        ok_bwd = ((ok_cot is not None and ok_fold is not None
                   and ok_place is not None) or None)
    else:
        ok_bwd = compile_one(f"{tag}_bwd_block", bwd_block, *fwd_args,
                             accs)
    return (ok_setup is not None and ok_prep is not None
            and ok_fwd is not None and ok_bwd is not None)


def run_full(name, cfg, reps=2):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((VOL,) * 3, dtype=np.float32)
                      * 0.1 + 0.3)
    tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
    lf0 = np.array([1.5, 1.0, 2.5], np.float32)

    def loss_fn(out):
        return jnp.mean(out.image ** 2)

    def step(c):
        lf = jnp.asarray(lf0) + c * 1e-6
        loss, (dv, dt) = value_and_grad_blockwise(
            vol, tf, lf, cfg, loss_fn, sampling_rate=1.0)
        return c + 1 + dv.ravel()[0] * 0 + loss * 0

    try:
        t0 = time.time()
        c = jnp.float32(float(step(jnp.float32(0.0))))
        first_s = time.time() - t0
        samples = []
        for _ in range(reps):
            t0 = time.time()
            c = jnp.float32(float(step(c)))
            samples.append(round(time.time() - t0, 4))
        log(exp="r6_bisect512", run=name, first_call_s=round(first_s, 1),
            samples=samples)
    except Exception as e:  # noqa: BLE001
        log(exp="r6_bisect512", run=name,
            error=f"{type(e).__name__}: {e}"[:300])


cfg_sorted = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                          max_samples=512, march_vjp="sorted",
                          block_size=32)
assert cfg_sorted.resolved_march_table() == "super64s2"

# Split-backward ladder: b32 first (post-hoist fwd block is known to
# compile at b32/b16 and fail at b64 — r6_bisect512 rows).
for bs in (32, 16):
    cfg_bs = cfg_sorted.replace(block_size=bs)
    if bisect(cfg_bs, f"split_b{bs}"):
        run_full(f"blockwise_split_b{bs}", cfg_bs, reps=2)
        break
log(exp="r6_bisect512", run="bisect_done")
