"""Round-11: where does the 1.52 s headline fwd+bwd go, and what did the
packed depth-sort permute buy?

Part A — phase breakdown of the headline gradient step (256^3 / 512^2 /
512 samples, sorted VJP, block 64, w64k) using the blockwise program
split (same block math as the monolithic step; the per-phase sync makes
the attribution honest at ~ms granularity).  Feeds VERDICT r3 item 3
(sub-1 s): which of march-recompute / fold / placement to attack next.

Part B — render_depth_sorted after the packed (N, 8) permute (one gather
in + one scatter out instead of 7 ops): re-measure phantom + noise at
chunks=4 vs the pre-packing r8 rows (phantom 2.07 s, noise 2.13 s).

Chained-protocol timing (CLAUDE.md rule 4); arrays as jit args (rule 2).
Appends to experiments/r8_headline_results.jsonl.
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
from differender_tpu.render import (_blockwise_head, _blockwise_programs,
                                    _blockwise_rays_program,
                                    _block_sample_spec,
                                    _safe_supercell_group,
                                    render, render_depth_sorted)
from differender_tpu.transfer import get_tf
from differender_tpu.utils.scenes import ct_phantom


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG, MS, SR = 256, 512, 512, 1.0
key = jax.random.PRNGKey(0)
vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
vol_phantom = jnp.asarray(ct_phantom(VOL))
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=64, march_vjp="sorted")


def loss_fn(out):
    return jnp.mean(out.image ** 2)


def breakdown(tag, vol, warm):
    """One blockwise step with per-phase sync; log the warm rep."""
    n_steps = cfg.diff_march_steps(SR)
    block = max(1, min(cfg.block_size, n_steps))
    n_blocks = -(-n_steps // block)
    prep_vol, fwd_block, bwd_block, place_block = _blockwise_programs(
        cfg, SR, True, block)
    loss_head = _blockwise_head(loss_fn, cfg)
    setup = _blockwise_rays_program(cfg, SR, False)
    origin, ray_ns, soa = setup(jnp.asarray(lf0), jax.random.PRNGKey(0))
    t0 = time.time()
    vol_tbl = prep_vol(vol)
    jax.block_until_ready(vol_tbl)
    t_table = time.time() - t0

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
    t_fwd = time.time() - t0

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
        tb = time.time()
        dt, d_accs, cots = bwd_block(tf, vol_tbl, soa, origin,
                                     accs_b, cnt_b, s0, d_accs)
        jax.block_until_ready(cots)
        t_cot += time.time() - tb
        tb = time.time()
        base, d_rows = place_block.fold_block(soa, origin, s0, cots)
        jax.block_until_ready(d_rows)
        t_fold += time.time() - tb
        tb = time.time()
        d_acc = place_block.place_rows(d_acc, base, d_rows)
        d_tf = d_tf + dt
        jax.block_until_ready(d_acc)
        t_place += time.time() - tb
    tb = time.time()
    d_volume = place_block.finalize(d_acc)
    jax.block_until_ready(d_volume)
    t_fin = time.time() - tb
    if warm:
        log(exp="r11_breakdown", run=tag, n_blocks=n_blocks,
            table_s=round(t_table, 4), fwd_s=round(t_fwd, 4),
            head_s=round(t_head, 4), cot_s=round(t_cot, 4),
            fold_s=round(t_fold, 4), place_s=round(t_place, 4),
            fin_s=round(t_fin, 4),
            total_s=round(t_table + t_fwd + t_head + t_cot + t_fold
                          + t_place + t_fin, 4))
    return float(loss)


def chain(f, n, *args):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(round(time.time() - t0, 4))
    return out


def grad_step(render_fn, cfg_, **kw):
    @jax.jit
    def f(c, v, t):
        lf = jnp.asarray(lf0) + c * 1e-6
        g = jax.grad(lambda v_, t_: jnp.mean(
            render_fn(v_, t_, lf, cfg_, sampling_rate=SR, **kw).image ** 2),
            argnums=(0, 1))(v, t)
        return c + 1 + g[0].sum() * 0
    return f


def run(name, f, *args, n=2):
    try:
        t0 = time.time()
        samples = chain(f, n, *args)
        log(exp="r11_headline", run=name,
            first_s=round(time.time() - t0 - sum(samples), 1),
            samples=samples)
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r11_headline", run=name,
            error=f"{type(e).__name__}: {e}"[:300])


# Part A: breakdown (cold then warm).
try:
    breakdown("headline_noise_cold", vol_noise, warm=False)
    breakdown("headline_noise", vol_noise, warm=True)
except Exception as e:  # noqa: BLE001
    log(exp="r11_breakdown", run="error",
        error=f"{type(e).__name__}: {e}"[:300])

# Part B: packed depth-sorted vs plain, both scenes.
ds4 = lambda *a, **k: render_depth_sorted(*a, chunks=4, **k)  # noqa: E731
run("packed_ds4_phantom", grad_step(ds4, cfg), vol_phantom, tf)
run("packed_ds4_noise", grad_step(ds4, cfg), vol_noise, tf)
run("plain_noise_ctl", grad_step(render, cfg), vol_noise, tf)
log(exp="r11_headline", run="done")
