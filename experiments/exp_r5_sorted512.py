"""Round-5: bisect the 512^3 sorted-VJP remote-compile crash.

At 512^3 (stride-2 table, G=2) march_vjp="sorted" crashes the TPU compile
helper (HTTP 500, subprocess exit 1) at blocks 64/32 and box_rows
256k/1M (r4_session2_results.jsonl), while the identical config compiles
at 256^3 and the AD scatter path compiles at 512^3.  Isolate WHICH
ingredient kills the helper by compiling the pieces standalone at exact
512^3 shapes:

  place512      jit(_sorted_volume_grad) alone at 512^3-s2 shapes
                (M = 8.4M rows = 512^2 rays x 32 G=2-groups per block-64,
                Ck = 67M keys, (2, 67M) f32 accumulator = 537 MB): is the
                placement loop itself the trigger?
  place_bisect  same M at (256,512,512) then (128,512,512): halve the
                accumulator to find a size cliff.
  strips4       full fwd+bwd at 512^3 via render_strips(n_strips=4)
                with march_vjp="sorted" block 64 (M/4 rows per program,
                accumulator unchanged): does shrinking the per-program
                row count unblock the helper?  If it compiles, time it
                against the 9.82 s AD number (r3_s2_results.jsonl).

Chained-protocol timing (CLAUDE.md rule 4); arrays passed as jit args
(rule 2).  Appends to experiments/r5_sorted512_results.jsonl.
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
from differender_tpu.render import render_strips
from differender_tpu.sampling import SampleSpec, _sorted_volume_grad


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def run(name, fn, *args, reps=2):
    """Compile + chained timing; logs errors instead of dying."""
    try:
        t0 = time.time()
        c = jnp.float32(float(fn(jnp.float32(0.0), *args)))
        compile_s = time.time() - t0
        samples = []
        for _ in range(reps):
            t0 = time.time()
            c = jnp.float32(float(fn(c, *args)))
            samples.append(round(time.time() - t0, 4))
        log(exp="r5_sorted512", run=name, compile_s=round(compile_s, 1),
            samples=samples)
        return True
    except Exception as e:  # noqa: BLE001 — record and continue the bisect
        log(exp="r5_sorted512", run=name,
            error=f"{type(e).__name__}: {e}"[:300])
        return False


# --- part 1: standalone placement at 512^3-s2 shapes ----------------------
M = (512 * 512) * 32          # rows of ONE block-64 backward at G=2
rng = np.random.default_rng(0)


def placement_case(name, shape):
    spec = SampleSpec(volume_shape=shape, delta=1e-3, group=2, parity=True,
                      n_tiles=1, box=32, box_rows=1 << 18,
                      window_rows=1 << 16, stride2=True)
    Ck = (shape[0] * shape[1] * shape[2]) // 2
    base = rng.integers(0, Ck, size=M, dtype=np.int32)
    d_rows = rng.standard_normal((M, 64), dtype=np.float32) * 1e-3

    @jax.jit
    def f(c, b, r):
        dv = _sorted_volume_grad(spec, b + (c * 0).astype(jnp.int32),
                                 r + c * 1e-12)
        return c + 1 + dv.ravel()[0] * 0

    ok = run(name, f, jnp.asarray(base), jnp.asarray(d_rows))
    del base, d_rows
    return ok


ok512 = placement_case("place512", (512, 512, 512))
if not ok512:
    placement_case("place_256x512x512", (256, 512, 512))
    placement_case("place_128x512x512", (128, 512, 512))

# --- part 2: full fwd+bwd via render_strips --------------------------------
VOL, IMG = 512, 512
vol = rng.standard_normal((VOL,) * 3, dtype=np.float32) * 0.1 + 0.3
from differender_tpu.transfer import get_tf  # noqa: E402

tf = np.asarray(get_tf("tf1", 128), np.float32)
lf0 = np.array([1.5, 1.0, 2.5], np.float32)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=512, block_size=64, march_vjp="sorted")
assert cfg.resolved_march_table() == "super64s2", cfg.resolved_march_table()


def strip_step(c, v, t, n_strips):
    lf = jnp.asarray(lf0) + c * 1e-6
    g = jax.grad(lambda v_, t_: jnp.mean(render_strips(
        v_, t_, lf, cfg, sampling_rate=1.0, n_strips=n_strips).image ** 2),
        argnums=(0, 1))(v, t)
    return c + 1 + g[0].ravel()[0] * 0


vj, tj = jnp.asarray(vol), jnp.asarray(tf)
run("strips4_sorted_fwdbwd", lambda c, v, t: strip_step(c, v, t, 4), vj, tj,
    reps=2)
