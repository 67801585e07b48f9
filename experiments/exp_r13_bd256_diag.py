"""Round-13: the 256^3 blockwise breakdown (exp_r11) OOMs on the TPU while
the 512^3 blockwise step (exp_r12, value_and_grad_blockwise) runs at 8.8 s
— find the phase that exhausts memory.

Same program sequence as exp_r11's Part A, but every phase is logged
BEFORE it runs (so the last log line names the OOM site), with
jax.live_arrays() totals, and the whole thing wrapped so the exception's
frame references are dropped before anything else runs.

Appends to experiments/r8_headline_results.jsonl.
"""
import gc
import json
import os
import sys
import time
import traceback

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r8_headline_results.jsonl")

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


def live_mb():
    gc.collect()
    total = 0.0
    big = []
    for a in jax.live_arrays():
        mb = a.size * a.dtype.itemsize / (1 << 20)
        total += mb
        if mb >= 64:
            big.append([round(mb, 1), str(a.shape)])
    return round(total, 1), big


VOL, IMG, MS, SR = 256, 512, 512, 1.0
key = jax.random.PRNGKey(0)
vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted")


def loss_fn(out):
    return jnp.mean(out.image ** 2)


def phase(name):
    total, big = live_mb()
    log(exp="r13_bd256", run="phase", phase=name, live_total_mb=total,
        big=big)


def breakdown(vol):
    n_steps = cfg.diff_march_steps(SR)
    block = max(1, min(cfg.block_size, n_steps))
    n_blocks = -(-n_steps // block)
    phase("factories")
    prep_vol, fwd_block, bwd_block, place_block = _blockwise_programs(
        cfg, SR, True, block)
    loss_head = _blockwise_head(loss_fn, cfg)
    setup = _blockwise_rays_program(cfg, SR, False)
    phase("setup_rays")
    origin, ray_ns, soa = setup(jnp.asarray(lf0), jax.random.PRNGKey(0))
    jax.block_until_ready(origin)
    phase("prep_vol(table)")
    t0 = time.time()
    vol_tbl = prep_vol(vol)
    jax.block_until_ready(vol_tbl)
    log(exp="r13_bd256", run="table", s=round(time.time() - t0, 3),
        table_shape=str(vol_tbl.shape),
        table_gb=round(vol_tbl.size * 4 / 1e9, 2))

    N = IMG * IMG
    zero = jnp.zeros((N,), jnp.float32)
    accs = (zero, zero, zero, zero)
    cnt = jnp.ones((N,), jnp.int32)
    carries = []
    t0 = time.time()
    for b in range(n_blocks):
        phase(f"fwd_block_{b}")
        carries.append((accs, cnt))
        accs, cnt = fwd_block(vol, tf, vol_tbl, soa, origin, accs, cnt,
                              jnp.int32(b * block))
        jax.block_until_ready(cnt)
    t_fwd = time.time() - t0

    phase("head")
    t0 = time.time()
    loss, head_vjp = jax.vjp(lambda a: loss_head(a, cnt, ray_ns, ()), accs)
    (d_accs,) = head_vjp(jnp.float32(1.0))
    jax.block_until_ready(d_accs)
    t_head = time.time() - t0

    from differender_tpu.sampling import sorted_acc_shape
    spec = _block_sample_spec(cfg, cfg.resolved_march_table(),
                              _safe_supercell_group(cfg, SR, block), True)
    d_acc = jnp.zeros(sorted_acc_shape(spec), jnp.float32)
    d_tf = jnp.zeros_like(tf)
    t_cot = t_fold = t_place = 0.0
    for b in range(n_blocks - 1, -1, -1):
        accs_b, cnt_b = carries[b]
        s0 = jnp.int32(b * block)
        phase(f"bwd_cot_{b}")
        tb = time.time()
        dt, d_accs, cots = bwd_block(tf, vol_tbl, soa, origin,
                                     accs_b, cnt_b, s0, d_accs)
        jax.block_until_ready(cots)
        t_cot += time.time() - tb
        phase(f"bwd_fold_{b}")
        tb = time.time()
        base, d_rows = place_block.fold_block(soa, origin, s0, cots)
        jax.block_until_ready(d_rows)
        t_fold += time.time() - tb
        phase(f"bwd_place_{b}")
        tb = time.time()
        d_acc = place_block.place_rows(d_acc, base, d_rows)
        d_tf = d_tf + dt
        jax.block_until_ready(d_acc)
        t_place += time.time() - tb
        del cots, base, d_rows
    phase("finalize")
    tb = time.time()
    d_volume = place_block.finalize(d_acc)
    jax.block_until_ready(d_volume)
    t_fin = time.time() - tb
    log(exp="r13_bd256", run="breakdown", n_blocks=n_blocks,
        fwd_s=round(t_fwd, 4), head_s=round(t_head, 4),
        cot_s=round(t_cot, 4), fold_s=round(t_fold, 4),
        place_s=round(t_place, 4), fin_s=round(t_fin, 4),
        total_s=round(t_fwd + t_head + t_cot + t_fold + t_place + t_fin, 4))
    return float(loss)


for rep in ("cold", "warm"):
    try:
        loss = breakdown(vol_noise)
        log(exp="r13_bd256", run=f"{rep}_ok", loss=loss)
    except Exception as e:  # noqa: BLE001
        tb_last = traceback.format_exc().strip().splitlines()[-1]
        log(exp="r13_bd256", run=f"{rep}_error", error=tb_last[:300])
        sys.exc_info()  # drop frames:
        import sys as _s
        _s.last_traceback = None
        break
log(exp="r13_bd256", run="done")
