"""Timing sanity: does block_until_ready actually block on the axon relay?
Compares block_until_ready vs float() host materialization per iteration,
with a known-cost matmul anchor."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
import jax, jax.numpy as jnp, numpy as np

def rec(**kw):
    print(json.dumps(kw), flush=True)

M = 1 << 24
key = jax.random.PRNGKey(0)
print("devices:", jax.devices(), flush=True)

# anchor: (8192^2)@(8192^2) f32-highest matmul, ~1.1 TFLOP
A = jax.random.uniform(key, (8192, 8192), jnp.float32)
@jax.jit
def mm(c, A):
    B = A + c * 1e-9
    return c + 1 + jnp.sum(B @ B) * 1e-30

# row gather W=8
idx = jax.random.randint(key, (M,), 0, 1 << 21, jnp.int32)
table = jax.random.uniform(key, (1 << 21, 8), jnp.float32)
@jax.jit
def rg(c, table, idx):
    i = (idx + c.astype(jnp.int32)) % (1 << 21)
    v = jnp.take(table + c * 1e-9, i, axis=0)
    return c + 1 + v.sum() * 1e-20

for name, f, args in (("matmul8k", mm, (A,)), ("rowW8", rg, (table, idx))):
    c = f(jnp.float32(0.0), *args); jax.block_until_ready(c)
    # method A: block_until_ready at end
    t0 = time.time()
    for _ in range(4): c = f(c, *args)
    jax.block_until_ready(c)
    tA = (time.time() - t0) / 4
    # method B: float() each iteration
    t0 = time.time()
    for _ in range(4):
        c = f(c, *args); c = jnp.float32(float(c))
    tB = (time.time() - t0) / 4
    rec(name=name, block_until_ready_s=round(tA, 5), host_roundtrip_s=round(tB, 5))
