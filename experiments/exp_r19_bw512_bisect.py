"""Round-19: which program of the COMPACTED 512^3 blockwise step crashes
the remote compile helper (r18 step0 HTTP 500)?

Calls the pieces in the same order as value_and_grad_blockwise with
per-piece logging: setup, prep_vol, full-width fwd blocks 0..1,
alive/order, pack/permute, P-width fwd block, loss head, P-width bwd cot
+ fold + place.  Appends to experiments/r5_sorted512_results.jsonl.
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
                                    _bw_alive_order, _bw_pack_permute,
                                    _RaySoA)
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def stage(name, f):
    t0 = time.time()
    try:
        out = f()
        jax.block_until_ready(out)
        log(exp="r19_bisect", run=name, s=round(time.time() - t0, 1))
        return out
    except Exception as e:  # noqa: BLE001
        log(exp="r19_bisect", run=name,
            error=f"{type(e).__name__}: {e}"[:250])
        sys.exit(1)


VOL, IMG, MS, SR, BLOCK = 512, 512, 512, 1.0, 64
N = IMG * IMG
P = N // 16
vol = jax.random.uniform(jax.random.PRNGKey(1), (VOL,) * 3,
                         jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=BLOCK, march_vjp="sorted",
                   march_table="super64s2")

prep_vol, fwd_block, bwd_cot, place_block = _blockwise_programs(
    cfg, SR, True, BLOCK)
setup = _blockwise_rays_program(cfg, SR, False)
origin, ray_ns, soa = stage(
    "setup", lambda: setup(jnp.asarray(lf0), jax.random.PRNGKey(0)))
vol_tbl = stage("prep_vol", lambda: prep_vol(vol))

zero = jnp.zeros((N,), jnp.float32)
accs = (zero, zero, zero, zero)
cnt = jnp.ones((N,), jnp.int32)
for b in range(2):
    accs, cnt = stage(f"fwd_full_{b}",
                      lambda b=b, a=accs, c=cnt: fwd_block(
                          vol, tf, vol_tbl, soa, origin, a, c,
                          jnp.int32(b * BLOCK)))

na_order = stage("alive_order",
                 lambda: _bw_alive_order(accs[3], soa.n_samples,
                                         jnp.int32(2 * BLOCK),
                                         jnp.float32(cfg.ert_threshold)))
n_alive, order = na_order
log(exp="r19_bisect", run="alive_count", n=int(n_alive))
pk = stage("pack_permute", lambda: _bw_pack_permute(order, soa, accs, cnt))
soa_c = _RaySoA(dx=pk[:P, 0], dy=pk[:P, 1], dz=pk[:P, 2], t0=pk[:P, 3],
                dt=pk[:P, 4], n_samples=pk[:P, 5].astype(jnp.int32))
accs_c = tuple(pk[:P, 6 + i] for i in range(4))
cnt_c = pk[:P, 10].astype(jnp.int32)
accs_c2, cnt_c2 = stage("fwd_P", lambda: fwd_block(
    vol, tf, vol_tbl, soa_c, origin, accs_c, cnt_c, jnp.int32(2 * BLOCK)))

d_accs_c = tuple(jnp.ones((P,), jnp.float32) * 1e-3 for _ in range(4))
cot_out = stage("bwd_cot_P", lambda: bwd_cot(
    tf, vol_tbl, soa_c, origin, accs_c, cnt_c, jnp.int32(2 * BLOCK),
    d_accs_c))
dt_, d_prev, cots = cot_out
base, d_rows = stage("fold_P", lambda: place_block.fold_block(
    soa_c, origin, jnp.int32(2 * BLOCK), cots))
from differender_tpu.render import _block_sample_spec, _safe_supercell_group
from differender_tpu.sampling import sorted_acc_shape
spec = _block_sample_spec(cfg, cfg.resolved_march_table(),
                          _safe_supercell_group(cfg, SR, BLOCK), True)
d_acc = jnp.zeros(sorted_acc_shape(spec), jnp.float32)
d_acc = stage("place_P", lambda: place_block.place_rows(d_acc, base,
                                                        d_rows))
log(exp="r19_bisect", run="all_ok")
