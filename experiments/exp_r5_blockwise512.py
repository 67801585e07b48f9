"""Round-5: host-level per-block checkpointed backward at 512^3.

The bisect (r5_sorted512_results.jsonl) proved the sorted-VJP placement
loop compiles standalone at 512^3-s2 shapes while ANY monolithic
fwd+bwd program crashes the helper; strips (rays axis) never moved the
cliff.  value_and_grad_blockwise partitions the BLOCKS axis instead:
three small reused programs (fwd block / loss head / bwd block), each
holding one block's march and at most one placement instance.

Measures at 512^3 / 512^2 / 512 samples (stride-2 table, block 64):

  blockwise_sorted   the target: does it compile, and does it beat the
                     9.82 s monolithic-AD number (r3_s2_results.jsonl)?
  blockwise_ad       same partitioning, AD scatter per block — separates
                     the partitioning overhead from the sorted-VJP win.

Chained-protocol timing (CLAUDE.md rule 4); arrays as jit args (rule 2).
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

# Attribution: on a remote-compile crash, the last "Compiling ..." line
# in the process log names the program that hit the helper's limit
# (the overall-run rows in r5_sorted512_results.jsonl don't).
jax.config.update("jax_log_compiles", True)

import jax.numpy as jnp
import numpy as np

from differender_tpu.config import RenderConfig
from differender_tpu.render import value_and_grad_blockwise
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


VOL, IMG = 512, 512
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.standard_normal((VOL,) * 3, dtype=np.float32)
                  * 0.1 + 0.3)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128), np.float32))
lf0 = np.array([1.5, 1.0, 2.5], np.float32)


def run(name, cfg, reps=2):
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
        compile_s = time.time() - t0
        samples = []
        for _ in range(reps):
            t0 = time.time()
            c = jnp.float32(float(step(c)))
            samples.append(round(time.time() - t0, 4))
        log(exp="r5_blockwise512", run=name, compile_s=round(compile_s, 1),
            samples=samples)
        return True
    except Exception as e:  # noqa: BLE001 — record and continue
        log(exp="r5_blockwise512", run=name,
            error=f"{type(e).__name__}: {e}"[:300])
        return False


# Split backward (r6_bisect512: fwd block compiles at b32/b16 with the
# hoisted table, fails at b64; each backward HALF compiles alone).  Try
# block 32 first (known-compiling fwd), then b64 as a probe.
cfg_sorted = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                          max_samples=512, block_size=32,
                          march_vjp="sorted")
assert cfg_sorted.resolved_march_table() == "super64s2"
ok = run("blockwise_split_sorted_b32", cfg_sorted, reps=2)
run("blockwise_split_sorted_b64", cfg_sorted.replace(block_size=64), reps=2)
log(exp="r5_blockwise512", run="done")
