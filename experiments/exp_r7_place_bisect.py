"""Round-7: why does place_rows fail where bare _sorted_volume_grad passed?

r6_bisect512 (fold/place split): EVERY split-backward program now compiles
at 512^3 EXCEPT place_rows = `d_vol + _sorted_volume_grad(...)` with
donate_argnums=(0,), yet the r5 place512 row compiled a bare
jit(_sorted_volume_grad) at 2x the row count.  Two deltas: the d_vol add
(one extra 512MB operand) and input-output donation.  Attribute them:

  pure         jit(_sorted_volume_grad) at the EXACT b32 split shapes
  add          jit(d + _sorted_volume_grad) no donation
  add_donate   the shipped place_rows (donated accumulator)

Appends to experiments/r5_sorted512_results.jsonl.
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r5_sorted512_results.jsonl")

import functools

import jax
import jax.numpy as jnp

from differender_tpu.sampling import SampleSpec, _sorted_volume_grad


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL = 512
N = 512 * 512
BLOCK = 32
G = 2
Mg = (BLOCK // G) * N                      # rows of one b32 block at G=2

spec = SampleSpec(volume_shape=(VOL,) * 3, delta=1e-3, group=G, parity=True,
                  n_tiles=1, box=32, box_rows=1 << 18, window_rows=1 << 16,
                  stride2=True)

f32, i32 = jnp.float32, jnp.int32


def sds(shape, dtype=f32):
    return jax.ShapeDtypeStruct(shape, dtype)


def compile_one(name, fn, *arg_structs):
    try:
        t0 = time.time()
        compiled = fn.lower(*arg_structs).compile()
        log(exp="r7_place_bisect", program=name,
            compile_s=round(time.time() - t0, 1))
        return compiled
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r7_place_bisect", program=name,
            error=f"{type(e).__name__}: {e}"[:300])
        return None


vol_sds = sds((VOL,) * 3)
base_sds = sds((Mg,), i32)
rows_sds = sds((Mg, 64))

pure = jax.jit(lambda b, r: _sorted_volume_grad(spec, b, r))
add = jax.jit(lambda d, b, r: d + _sorted_volume_grad(spec, b, r))
add_donate = jax.jit(lambda d, b, r: d + _sorted_volume_grad(spec, b, r),
                     donate_argnums=(0,))

compile_one("place_pure_b32", pure, base_sds, rows_sds)
compile_one("place_add_b32", add, vol_sds, base_sds, rows_sds)
compile_one("place_add_donate_b32", add_donate, vol_sds, base_sds, rows_sds)
log(exp="r7_place_bisect", run="done")


# --- discriminate: verbatim place512 (dispatch compile, chained scalar
# output) vs full-array output vs AOT lowering -----------------------------
import numpy as np

M512 = (512 * 512) * 32
rng = np.random.default_rng(0)
Ck = (512 ** 3) // 2


def run_dispatch(name, f, *args):
    try:
        t0 = time.time()
        out = jax.block_until_ready(f(*args))
        log(exp="r7_place_bisect", program=name,
            first_call_s=round(time.time() - t0, 1))
        del out
        return True
    except Exception as e:  # noqa: BLE001
        log(exp="r7_place_bisect", program=name,
            error=f"{type(e).__name__}: {e}"[:300])
        return False


base512 = jnp.asarray(rng.integers(0, Ck, size=M512, dtype=np.int32))
rows512 = jnp.asarray(
    rng.standard_normal((M512, 64), dtype=np.float32) * 1e-3)


@jax.jit
def place512_verbatim(c, b, r):
    dv = _sorted_volume_grad(spec, b + (c * 0).astype(jnp.int32),
                             r + c * 1e-12)
    return c + 1 + dv.ravel()[0] * 0


run_dispatch("place512_verbatim_rerun", place512_verbatim,
             jnp.float32(0.0), base512, rows512)


@jax.jit
def place_full_out(b, r):
    return _sorted_volume_grad(spec, b, r)


run_dispatch("place_full_out_dispatch", place_full_out,
             base512[:Mg], rows512[:Mg])
log(exp="r7_place_bisect", run="done2")
