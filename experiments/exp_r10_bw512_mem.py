"""Round-10: 512^3 split-blockwise backward — HBM attribution.

The r5 reruns (r5_sorted512_results.jsonl, ts 1787151859) got every
program COMPILED at 512^3 (the half-lattice accumulate + strided-scatter
finalize closed the compile-budget gap) but died at execution with
RESOURCE_EXHAUSTED.  Hypothesis: JAX async dispatch queued all 16
backward blocks, holding every block's ~1.2 GB of transients (cots +
fold rows) in flight at once; value_and_grad_blockwise now syncs once
per block.  This probe mirrors the library loop phase by phase and logs
device memory_stats (if the axon plugin exposes them) so that — if the
sync is NOT enough — the failing phase and its live-buffer peak are in
the log.

Appends to experiments/r5_sorted512_results.jsonl.
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
from differender_tpu.render import (_blockwise_head, _blockwise_programs,
                                    _blockwise_rays_program,
                                    _block_sample_spec,
                                    _safe_supercell_group)
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def mem():
    try:
        s = jax.local_devices()[0].memory_stats()
        if not s:
            return None
        return {k: int(v) // (1 << 20) for k, v in s.items()
                if "bytes_in_use" in k or "peak" in k or "limit" in k}
    except Exception:
        return None


VOL, IMG = 512, 512
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.standard_normal((VOL,) * 3, dtype=np.float32)
                  * 0.1 + 0.3)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.5, 1.0, 2.5], np.float32)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=512, block_size=32, march_vjp="sorted")
assert cfg.resolved_march_table() == "super64s2"
sr = 1.0


def loss_fn(out):
    return jnp.mean(out.image ** 2)


def one_step(tag):
    n_steps = cfg.diff_march_steps(sr)
    block = max(1, min(cfg.block_size, n_steps))
    n_blocks = -(-n_steps // block)
    prep_vol, fwd_block, bwd_block, place_block = _blockwise_programs(
        cfg, sr, True, block)
    loss_head = _blockwise_head(loss_fn, cfg)
    setup = _blockwise_rays_program(cfg, sr, False)
    t0 = time.time()
    origin, ray_ns, soa = setup(jnp.asarray(lf0), jax.random.PRNGKey(0))
    vol_tbl = prep_vol(vol)
    jax.block_until_ready(vol_tbl)
    log(exp="r10_bw512_mem", run=tag, phase="table",
        s=round(time.time() - t0, 2), mem=mem())

    N = IMG * IMG
    zero = jnp.zeros((N,), jnp.float32)
    accs = (zero, zero, zero, zero)
    cnt = jnp.ones((N,), jnp.int32)
    carries = []
    t0 = time.time()
    for b in range(n_blocks):
        carries.append((accs, cnt))
        accs, cnt = fwd_block(vol, tf, vol_tbl, soa, origin, accs, cnt,
                              jnp.int32(b * block))
        jax.block_until_ready(cnt)
    log(exp="r10_bw512_mem", run=tag, phase="fwd",
        s=round(time.time() - t0, 2), n_blocks=n_blocks, mem=mem())

    t0 = time.time()
    loss, head_vjp = jax.vjp(
        lambda a: loss_head(a, cnt, ray_ns, ()), accs)
    (d_accs,) = head_vjp(jnp.float32(1.0))
    jax.block_until_ready(d_accs)
    log(exp="r10_bw512_mem", run=tag, phase="head",
        s=round(time.time() - t0, 2), mem=mem())

    from differender_tpu.sampling import sorted_acc_shape
    spec = _block_sample_spec(cfg, cfg.resolved_march_table(),
                              _safe_supercell_group(cfg, sr, block), True)
    d_acc = jnp.zeros(sorted_acc_shape(spec), jnp.float32)
    d_tf = jnp.zeros_like(tf)
    t0 = time.time()
    for b in range(n_blocks - 1, -1, -1):
        accs_b, cnt_b = carries[b]
        s0 = jnp.int32(b * block)
        tb = time.time()
        dt, d_accs, cots = bwd_block(tf, vol_tbl, soa, origin,
                                     accs_b, cnt_b, s0, d_accs)
        jax.block_until_ready(cots)
        t_cot = time.time() - tb
        tb = time.time()
        d_acc = place_block(d_acc, soa, origin, s0, cots)
        d_tf = d_tf + dt
        jax.block_until_ready(d_acc)
        if b in (n_blocks - 1, n_blocks // 2, 0):
            log(exp="r10_bw512_mem", run=tag, phase=f"bwd_block_{b}",
                cot_s=round(t_cot, 3),
                place_s=round(time.time() - tb, 3), mem=mem())
    t_bwd = time.time() - t0
    tb = time.time()
    d_volume = place_block.finalize(d_acc)
    jax.block_until_ready(d_volume)
    log(exp="r10_bw512_mem", run=tag, phase="bwd_total",
        bwd_s=round(t_bwd, 2), fin_s=round(time.time() - tb, 3), mem=mem())
    return loss, d_volume, d_tf


try:
    t0 = time.time()
    loss, dv, dt = one_step("b32_cold")
    log(exp="r10_bw512_mem", run="b32_cold", phase="total",
        s=round(time.time() - t0, 2), loss=float(loss),
        dv_norm=float(jnp.abs(dv).max()))
    # Warm rep = the honest per-step number (all programs compiled).
    t0 = time.time()
    loss, dv, dt = one_step("b32_warm")
    log(exp="r10_bw512_mem", run="b32_warm", phase="total",
        s=round(time.time() - t0, 2), loss=float(loss),
        dv_norm=float(jnp.abs(dv).max()))
except Exception as e:  # noqa: BLE001 — record and continue
    log(exp="r10_bw512_mem", run="error",
        error=f"{type(e).__name__}: {e}"[:300])
log(exp="r10_bw512_mem", run="done")
