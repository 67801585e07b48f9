"""Round-4: decisive per-block backward breakdown at headline scale.

parity_sorted_b16_skip measured 4.64 s vs ad 4.50 s — the sorted-window
placement did NOT translate its 7x microbench win.  Decompose ONE block's
backward into its three candidate costs, with march-realistic shapes
(kg=4, N=512^2 -> M=1M rows, G=4, 256^3 table):

  d_rows       — _super_bwd_rows alone (the hat-weight transpose both
                 paths pay; suspected to be non-trivial)
  ad_scatter   — d_rows + zeros((C,64)).at[base].add(d_rows)   [AD path]
  sorted_place — d_rows + _sorted_volume_grad                  [new path]
  place_only   — _sorted_volume_grad on precomputed rows (placement net)
  adsc_only    — big-table scatter on precomputed rows
  cond_tax     — _sorted_volume_grad with rows forced into ONE window
                 (NW=1) vs default NW=8: isolates per-iteration cond cost
                 (S=64 subpasses regardless)

Bases: realistic march shell — one camera-depth slab of a diagonal view
(NOT uniform), built from actual ray geometry on the noise scene.
Slope protocol.  Appends to experiments/r4_sorted_march_results.jsonl.
"""
import json, os, sys, time
BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
OUT = os.path.join(BASE, "experiments", "r4_sorted_march_results.jsonl")
import jax, jax.numpy as jnp, numpy as np
from differender_tpu.config import RenderConfig
from differender_tpu.geometry import make_rays
from differender_tpu.render import march_params
from differender_tpu.sampling import (SampleSpec, _super_bwd_rows,
                                      _sorted_volume_grad)


def log(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def timed_host(f, *args, reps=2):
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(reps):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / reps


def slope(make_f, args, K1=1, K2=3):
    tA = timed_host(make_f(K1), *args)
    tB = timed_host(make_f(K2), *args)
    return (tB - tA) / (K2 - K1)


VOL, IMG, BLOCK, G = 256, 512, 16, 4
KG = BLOCK // G
N = IMG * IMG
C = VOL ** 3
cfg = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                   max_samples=512, block_size=BLOCK,
                   march_table="super64")
print("devices:", jax.devices(), flush=True)

# March-realistic positions: real ray geometry, steps 128..143 (mid-volume)
lf = jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32))
rays = make_rays(lf, cfg, 1.0, jitter_key=None)
params = march_params(rays)
steps = (128 + jnp.arange(BLOCK, dtype=jnp.int32))[:, None]
t = params.t0.reshape(1, N) + steps.astype(jnp.float32) * params.dt.reshape(1, N)
dirs = rays.dirs.reshape(N, 3)
px = rays.origin[0] + t * dirs[:, 0][None]
py = rays.origin[1] + t * dirs[:, 1][None]
pz = rays.origin[2] + t * dirs[:, 2][None]
key = jax.random.PRNGKey(0)
ci = jax.random.uniform(key, (BLOCK, N), jnp.float32)
cg = tuple(jax.random.uniform(jax.random.PRNGKey(i), (BLOCK, N), jnp.float32)
           for i in (1, 2, 3))
spec = SampleSpec(volume_shape=(VOL,) * 3, delta=1e-3, group=G, parity=True,
                  n_tiles=1, box=32)

px_np = np.asarray(px)  # stays on host; device args passed per call


def mk_drows(K):
    @jax.jit
    def f(c, px, py, pz, ci, cgx, cgy, cgz):
        def body(k, c):
            cot = (ci + c * 1e-9, (cgx, cgy, cgz))
            base, d_rows = _super_bwd_rows((VOL,) * 3, 1e-3, True, G,
                                           px, py, pz, cot)
            return c + d_rows[0, 0] * 1e-20 + base[0] * jnp.float32(1e-20) + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


def mk_adsc(K):
    @jax.jit
    def f(c, px, py, pz, ci, cgx, cgy, cgz):
        def body(k, c):
            cot = (ci + c * 1e-9, (cgx, cgy, cgz))
            base, d_rows = _super_bwd_rows((VOL,) * 3, 1e-3, True, G,
                                           px, py, pz, cot)
            d_tab = jnp.zeros((C, 64), jnp.float32).at[base].add(d_rows)
            return c + d_tab[0, 0] * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


def mk_sorted(K, wrows=1 << 17, brows=1 << 18):
    sp = spec._replace(window_rows=wrows, box_rows=brows)

    @jax.jit
    def f(c, px, py, pz, ci, cgx, cgy, cgz):
        def body(k, c):
            cot = (ci + c * 1e-9, (cgx, cgy, cgz))
            base, d_rows = _super_bwd_rows((VOL,) * 3, 1e-3, True, G,
                                           px, py, pz, cot)
            d_vol = _sorted_volume_grad(sp, base, d_rows)
            return c + d_vol[0, 0, 0] * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


# Precomputed-rows variants (placement net of d_rows)
base0, d_rows0 = jax.jit(lambda px, py, pz, ci, cg1, cg2, cg3:
                         _super_bwd_rows((VOL,) * 3, 1e-3, True, G,
                                         px, py, pz, (ci, (cg1, cg2, cg3)))
                         )(px, py, pz, ci, *cg)
base0 = jax.block_until_ready(base0)


def mk_place(K, wrows=1 << 17, brows=1 << 18):
    sp = spec._replace(window_rows=wrows, box_rows=brows)

    @jax.jit
    def f(c, b, r):
        def body(k, c):
            d_vol = _sorted_volume_grad(
                sp, (b + (c + k).astype(jnp.int32) * 0) % C, r + c * 1e-9)
            return c + d_vol[0, 0, 0] * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


def mk_adsc_only(K):
    @jax.jit
    def f(c, b, r):
        def body(k, c):
            d_tab = jnp.zeros((C, 64), jnp.float32).at[
                (b + (c + k).astype(jnp.int32) * 0) % C].add(r + c * 1e-9)
            return c + d_tab[0, 0] * 1e-20 + 1e-6
        return jax.lax.fori_loop(0, K, body, c)
    return f


args7 = (px, py, pz, ci, *cg)
for name, mk, a in (
        ("bd_d_rows", mk_drows, args7),
        ("bd_ad_scatter", mk_adsc, args7),
        ("bd_sorted_place", mk_sorted, args7),
        ("bd_place_only_w128k", lambda K: mk_place(K), (base0, d_rows0)),
        ("bd_place_only_w1m", lambda K: mk_place(K, wrows=1 << 20),
         (base0, d_rows0)),
        ("bd_adsc_only", mk_adsc_only, (base0, d_rows0)),
):
    try:
        s = slope(mk, a)
        log(exp="r4_bwd_breakdown", run=name, per_block_s=round(s, 5))
    except Exception as e:
        log(exp="r4_bwd_breakdown", run=name,
            error=f"{type(e).__name__}: {e}"[:300])
print("done", flush=True)
