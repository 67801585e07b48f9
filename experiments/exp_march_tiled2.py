"""Tiled-VJP TPU scale ladder — isolate the worker-crash threshold.

Runs each config in a SEPARATE subprocess (a crashed TPU worker poisons
the process); ladder from tiny to headline.
Appends JSON to experiments/cell_march_results.jsonl.
"""
import json
import os
import subprocess
import sys

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(BASE, "experiments", "cell_march_results.jsonl")

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(base)r)
import jax, jax.numpy as jnp, numpy as np
from differender_tpu import RenderConfig, render
from differender_tpu.transfer import get_tf

V, IMG, MS, BLK, TILE, BOX = %(v)d, %(img)d, %(ms)d, %(blk)d, %(tile)d, %(box)d
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (V,)*3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf('tf1', 128)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
cfg = RenderConfig(volume_shape=(V,)*3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=BLK, analytic_normals=%(ana)s,
                   march_table='super64', march_vjp='tiled',
                   vjp_tile=TILE, vjp_box=BOX)

@jax.jit
def step(c, v, t):
    lf = jnp.asarray(lf0) + c * 1e-6
    g = jax.grad(lambda v_, t_: jnp.mean(render(
        v_, t_, lf, cfg, sampling_rate=1.0).image ** 2),
        argnums=(0, 1))(v, t)
    return c + 1 + g[0].sum() * 1e-20 + g[1].sum() * 1e-20

c = jnp.float32(float(step(jnp.float32(0.0), vol, tf)))
t0 = time.time()
n = 2
for _ in range(n):
    c = jnp.float32(float(step(c, vol, tf)))
print('RESULT ' + json.dumps({'s': round((time.time()-t0)/n, 4)}))
"""


def main():
    ladder = [
        dict(v=64, img=64, ms=128, blk=16, tile=16, box=32, ana="True"),
        dict(v=128, img=128, ms=256, blk=16, tile=16, box=32, ana="True"),
        dict(v=256, img=256, ms=512, blk=16, tile=16, box=32, ana="True"),
        dict(v=256, img=512, ms=512, blk=16, tile=16, box=32, ana="True"),
        dict(v=256, img=512, ms=512, blk=16, tile=32, box=48, ana="True"),
        dict(v=256, img=512, ms=512, blk=8, tile=16, box=32, ana="False"),
    ]
    for cfgd in ladder:
        script = CHILD % dict(base=BASE, **cfgd)
        try:
            out = subprocess.run([sys.executable, "-c", script],
                                 capture_output=True, text=True,
                                 timeout=1500)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if line:
                rec = {"exp": "tiled_ladder", **cfgd,
                       **json.loads(line[0][7:])}
            else:
                tail = (out.stderr or out.stdout).strip().splitlines()
                rec = {"exp": "tiled_ladder", **cfgd,
                       "error": " | ".join(tail[-3:])[:400]}
        except subprocess.TimeoutExpired:
            rec = {"exp": "tiled_ladder", **cfgd, "error": "timeout"}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if "error" in rec and "RESOURCE" not in str(rec.get("error")):
            # keep climbing anyway — each child is isolated
            pass


if __name__ == "__main__":
    main()
