"""Slope-protocol ablation of one march block (32 steps x 512^2 rays)."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "block_ablate_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu.sampling import (_cell_base_fracs, _corner_weight_factors,
                                      _axis_bits, apply_tf_hat_soa)
from differender_tpu.shading import shade_soa
from differender_tpu.render import composite_block_soa
from differender_tpu.config import RenderConfig
from differender_tpu.transfer import get_tf

def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f: f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

def timed_host(f, *args, reps=2):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(reps):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / reps

def slope(make_f, args, K1=1, K2=5):
    tA = timed_host(make_f(K1), *args)
    tB = timed_host(make_f(K2), *args)
    return (tB - tA) / (K2 - K1)

K, N = 32, 512 * 512
M = K * N
key = jax.random.PRNGKey(0)
print("devices:", jax.devices(), flush=True)
cfg = RenderConfig(volume_shape=(256,)*3, image_shape=(512, 512),
                   max_samples=512, analytic_normals=True)
cell = jax.random.uniform(key, (1 << 24, 8), jnp.float32)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
px = jax.random.uniform(key, (K, N), jnp.float32) * 2 - 1
py = jax.random.uniform(jax.random.PRNGKey(1), (K, N), jnp.float32) * 2 - 1
pz = jax.random.uniform(jax.random.PRNGKey(2), (K, N), jnp.float32) * 2 - 1

def mk(variant):
    def make(reps):
        @jax.jit
        def f(c, cell, tf, px, py, pz):
            def body(k, c):
                d = c * 1e-9 + k * 1e-9
                pxx, pyy, pzz = px + d, py + d, pz + d
                base, fx, fy, fz = _cell_base_fracs(cfg.volume_shape, pxx, pyy, pzz)
                out = c
                if variant == "idxmath":
                    return c + (jnp.sum(fx) + base.sum()) * 1e-20
                vals = jnp.take(cell, base.reshape(-1), axis=0)   # (M, 8)
                if variant == "gather_only":
                    return c + vals.sum() * 1e-20
                vals = vals.T.reshape((8, K, N))
                if variant == "gather_T":
                    return c + vals.sum() * 1e-20
                wx, wy, wz = _corner_weight_factors(fx, fy, fz)
                intensity = jnp.sum(vals * (wx * wy * wz), axis=0)
                dbx, dby, dbz = (2.0 * _axis_bits(a, 2) - 1.0 for a in range(3))
                gx = jnp.sum(vals * (dbx * wy * wz), axis=0)
                gy = jnp.sum(vals * (wx * dby * wz), axis=0)
                gz = jnp.sum(vals * (wx * wy * dbz), axis=0)
                if variant == "sample_full":
                    return c + (intensity.sum() + gx.sum() + gy.sum() + gz.sum()) * 1e-20
                if variant == "tf_only":
                    r, g, b, a = apply_tf_hat_soa(tf, intensity)
                    return c + (r.sum() + a.sum()) * 1e-20
                if variant == "shade_only":
                    r = g = b = intensity; a = intensity * 0.5
                    pr, pg, pb, alpha = shade_soa(pxx, pyy, pzz, gx, gy, gz,
                                                  r, g, b, a, 0.1, 0.2, 0.3,
                                                  jnp.array([1.2, 0.8, 2.0]), 1.0, cfg, True)
                    return c + (pr.sum() + alpha.sum()) * 1e-20
                if variant == "composite_only":
                    zero = jnp.zeros((N,), jnp.float32)
                    accs, cnt, _ = composite_block_soa(
                        (zero, zero, zero, zero), None,
                        intensity[..., :], intensity, intensity, intensity * 0.01,
                        intensity > -10, cfg, ert=True)
                    return c + accs[0].sum() * 1e-20
                raise ValueError(variant)
            return jax.lax.fori_loop(0, reps, body, c)
        return f
    return make

for v in ("idxmath", "gather_only", "gather_T", "sample_full", "tf_only",
          "shade_only", "composite_only"):
    try:
        s = slope(mk(v), (cell, tf, px, py, pz))
        log(exp="ablate", variant=v, per_block_s=round(s, 4))
    except Exception as e:
        log(exp="ablate", variant=v, error=repr(e)[:300])
