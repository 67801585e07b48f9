"""Slope-measure backward components: hat-TF AD bwd, cell-row scatter."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "bwd_ablate_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu.sampling import apply_tf_hat_soa, _cell_base_fracs, _corner_weight_factors
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

def slope(make_f, args, K1=1, K2=4):
    return (timed_host(make_f(K2), *args) - timed_host(make_f(K1), *args)) / (K2 - K1)

K, N = 32, 512 * 512
key = jax.random.PRNGKey(0)
print("devices:", jax.devices(), flush=True)
tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
intens = jax.random.uniform(key, (K, N), jnp.float32)
cell = jax.random.uniform(key, (1 << 24, 8), jnp.float32)
px = jax.random.uniform(key, (K, N), jnp.float32) * 2 - 1
py = jax.random.uniform(jax.random.PRNGKey(1), (K, N), jnp.float32) * 2 - 1
pz = jax.random.uniform(jax.random.PRNGKey(2), (K, N), jnp.float32) * 2 - 1

# 1. hat fwd+bwd (AD) wrt tf and intensity
def mk_hat(reps):
    @jax.jit
    def f(c, tf, intens):
        def body(k, c):
            def loss(tf_, it):
                r, g, b, a = apply_tf_hat_soa(tf_, it + c * 1e-9 + k * 1e-9)
                return (r.sum() + g.sum() * 0.5 + b.sum() * 0.25 + a.sum())
            gtf, git = jax.grad(loss, argnums=(0, 1))(tf, intens)
            return c + gtf.sum() * 1e-20 + git.sum() * 1e-20
        return jax.lax.fori_loop(0, reps, body, c)
    return f
s = slope(mk_hat, (tf, intens))
log(exp="bwd", variant="hat_fwdbwd_AD", per_block_s=round(s, 4))

# 2. cell gather fwd+bwd wrt cell (the scatter)
def mk_scat(reps):
    @jax.jit
    def f(c, cell, px, py, pz):
        def body(k, c):
            d = c * 1e-9 + k * 1e-9
            def loss(cl):
                base, fx, fy, fz = _cell_base_fracs((256, 256, 256), px + d, py + d, pz + d)
                vals = jnp.take(cl, base.reshape(-1), axis=0).T.reshape((8, K, N))
                wx, wy, wz = _corner_weight_factors(fx, fy, fz)
                return jnp.sum(vals * (wx * wy * wz))
            g = jax.grad(loss)(cell)
            return c + g.sum() * 1e-20
        return jax.lax.fori_loop(0, reps, body, c)
    return f
s = slope(mk_scat, (cell, px, py, pz))
log(exp="bwd", variant="cell_gather_fwdbwd", per_block_s=round(s, 4))

# 3. composite + shade bwd proxy: elementwise chain grad
from differender_tpu.shading import shade_soa
from differender_tpu.render import composite_block_soa
from differender_tpu.config import RenderConfig
cfg = RenderConfig(volume_shape=(256,)*3, image_shape=(512, 512), max_samples=512, analytic_normals=True)
def mk_sh(reps):
    @jax.jit
    def f(c, px, py, pz, intens):
        def body(k, c):
            d = c * 1e-9 + k * 1e-9
            def loss(it):
                it = it + d
                pr, pg, pb, al = shade_soa(px, py, pz, it*0.1, it*0.2, it*0.3,
                                           it, it, it, it*0.5, 0.1, 0.2, 0.3,
                                           jnp.array([1.2, 0.8, 2.0]), 1.0, cfg, True)
                zero = jnp.zeros((N,), jnp.float32)
                accs, cnt, _ = composite_block_soa((zero,)*4, None, pr, pg, pb, al,
                                                   al > -1, cfg, ert=True)
                return accs[0].sum() + accs[3].sum()
            g = jax.grad(loss)(intens)
            return c + g.sum() * 1e-20
        return jax.lax.fori_loop(0, reps, body, c)
    return f
s = slope(mk_sh, (px, py, pz, intens))
log(exp="bwd", variant="shade_composite_fwdbwd", per_block_s=round(s, 4))
