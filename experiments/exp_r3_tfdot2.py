"""Round-3: two-level hierarchical TF classify (dot2) vs single-level dot.

Measures shear-warp fwd / fwd+bwd and the exact parity march fwd / fwd+bwd
at the headline config with both classify forms (the dispatch in
apply_tf_dot picks dot2; _apply_tf_dot_p forced via a monkeypatch for the
baseline)."""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r3_tfdot2_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
import differender_tpu.sampling as S
from differender_tpu import RenderConfig, render
from differender_tpu.fastpath import render_fast
from differender_tpu.transfer import get_tf


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def chain(f, n, args=()):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(n):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / n


VOL, IMG, MS, TF_RES, SR = 256, 512, 512, 128, 1.0
key = jax.random.PRNGKey(0)
vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)
print("devices:", jax.devices(), flush=True)

cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=MS, block_size=16, march_table="super64")

orig_dispatch = S.apply_tf_dot


def force(two_level):
    def patched(tf_, x, precision=jax.lax.Precision.HIGHEST):
        fn = S._apply_tf_dot2_p if two_level else S._apply_tf_dot_p
        return fn(precision, tf_, x)
    S.apply_tf_dot = patched
    # fastpath + march import apply_tf_dot by name at module level
    import differender_tpu.fastpath as FP
    FP.apply_tf_dot = patched


def mk_sw(mode):
    if mode == "grad":
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(render_fast(
                v_, t_, lf, cfg, intermediate=576,
                planes_per_voxel=2.0).image ** 2), argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0
    else:
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render_fast(v, t, lf, cfg, intermediate=576,
                              planes_per_voxel=2.0).image
            return c + 1 + img.sum() * 0
    return f


def mk_march(mode):
    if mode == "grad":
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            g = jax.grad(lambda v_, t_: jnp.mean(
                render(v_, t_, lf, cfg, sampling_rate=SR).image ** 2),
                argnums=(0, 1))(v, t)
            return c + 1 + g[0].sum() * 0
    else:
        @jax.jit
        def f(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render(v, t, lf, cfg, sampling_rate=SR).image
            return c + 1 + img.sum() * 0
    return f


for two in (True, False):
    force(two)
    tag = "dot2" if two else "dot1"
    for name, mk, mode, n in (("sw_fwd", mk_sw, "fwd", 2),
                              ("sw_grad", mk_sw, "grad", 2),
                              ("march_fwd", mk_march, "fwd", 2),
                              ("march_grad", mk_march, "grad", 1)):
        try:
            t = chain(mk(mode), n=n, args=(vol, tf))
            log(exp="tfdot2", form=tag, run=name, s=round(t, 4))
        except Exception as e:
            log(exp="tfdot2", form=tag, run=name,
                error=f"{type(e).__name__}: {e}"[:300])
