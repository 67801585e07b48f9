"""Headline benchmark (driver-run on TPU).

Metric (BASELINE.json): fwd+bwd steps/sec at 256^3 volume, 512^2 image,
plus forward Mrays/s.  Prints ONE JSON line.

Methodology notes:
  * Measurements chain a scalar through every iteration (the camera is
    perturbed by it), so no two executions see identical inputs — this
    defeats any transparent result caching in remote-TPU relays and forces
    a true device round per step.
  * Headline numbers use the ``analytic_normals`` fast mode (values exact,
    normals analytic — 8 instead of 56 gathered elements per sample);
    reference-parity mode timings are reported in ``aux``.
  * ``vs_baseline``: the reference publishes no numbers and Taichi is not
    installable here, so the baseline is THIS renderer on CPU (same mode),
    measured once at a scaled-down config and extrapolated linearly in
    sample count (cached in BASELINE_MEASURED.json).  See BASELINE.md.
"""
import json
import os
import subprocess
import sys
import time

BASE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(BASE, "BASELINE_MEASURED.json")

VOL, IMG, MAX_SAMPLES, TF_RES, SR, BLOCK = 256, 512, 512, 128, 1.0, 16
CPU_VOL, CPU_IMG, CPU_MS = 64, 128, 128   # CPU proxy config

_CPU_SCRIPT = r"""
import json, time, sys
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
sys.path.insert(0, %(base)r)
from differender_tpu import RenderConfig, render
from differender_tpu.transfer import get_tf
vol = jnp.asarray(np.random.default_rng(0).random((%(v)d,)*3, np.float32) * 0.5)
cfg = RenderConfig(volume_shape=(%(v)d,)*3, image_shape=(%(i)d, %(i)d),
                   max_samples=%(ms)d, block_size=%(blk)d,
                   analytic_normals=True)
tf = jnp.asarray(np.asarray(get_tf('tf1', %(tf)d)))
lf0 = np.array([1.2, 0.8, 2.0], np.float32)

@jax.jit
def step(c):
    lf = jnp.asarray(lf0) + c * 1e-6
    g = jax.grad(lambda v, t: jnp.mean(
        render(v, t, lf, cfg, sampling_rate=%(sr)f).image ** 2),
        argnums=(0, 1))(vol, tf)
    return c + 1 + g[0].sum() * 0

c = step(jnp.float32(0)); jax.block_until_ready(c)
t0 = time.time(); n = 2
for _ in range(n):
    c = step(c)
jax.block_until_ready(c)
print(json.dumps({'cpu_step_s': (time.time() - t0) / n}))
"""


def measure_cpu_baseline():
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    script = _CPU_SCRIPT % dict(base=BASE, v=CPU_VOL, i=CPU_IMG, ms=CPU_MS,
                                blk=BLOCK, tf=TF_RES, sr=SR)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=3600)
    cpu_small = json.loads(out.stdout.strip().splitlines()[-1])["cpu_step_s"]
    scale = (IMG * IMG * MAX_SAMPLES) / (CPU_IMG * CPU_IMG * CPU_MS)
    data = {
        "cpu_small_step_s": cpu_small,
        "cpu_small_config": [CPU_VOL, CPU_IMG, CPU_MS],
        "sample_scale": scale,
        "cpu_step_s_extrapolated": cpu_small * scale,
    }
    with open(CACHE, "w") as f:
        json.dump(data, f, indent=1)
    return data


def _chain_bench(f, n, args=()):
    """Chained-scalar timing.  Arrays are passed as jit ARGUMENTS — a
    closure-captured volume inlines a 64 MB constant into the MLIR module
    and OOM-kills the remote compile helper (CLAUDE.md rule 2)."""
    import jax
    import jax.numpy as jnp
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    t0 = time.time()
    for _ in range(n):
        c = jnp.float32(float(f(c, *args)))
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from differender_tpu import RenderConfig, render, render_nondiff
    from differender_tpu.transfer import get_tf

    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)

    def make(cfg, mode):
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
                img = render_nondiff(v, t, lf, cfg,
                                     sampling_rate=SR).image
                return c + 1 + img.sum() * 0
        return f

    # Exact-path round-2 config: supercell-64 march table (one 64-wide row
    # gather per 4 consecutive samples) + MXU-dot TF.  march_vjp stays "ad":
    # the hand-written tiled VJP wins below ~128^3 but its per-tile op
    # overhead loses to the AD scatter at the headline scale (BASELINE.md).
    cfg_fast = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                            max_samples=MAX_SAMPLES, block_size=BLOCK,
                            analytic_normals=True, march_table="super64")
    cfg_parity = cfg_fast.replace(analytic_normals=False, block_size=8,
                                  ert_block_skip=False)

    step_s = _chain_bench(make(cfg_fast, "grad"), n=2, args=(vol, tf))
    fwd_s = _chain_bench(make(cfg_fast, "fwd"), n=2, args=(vol, tf))

    # shear-warp fast path (slab-aligned quadrature, all-MXU resampling).
    # O=576 (1.125x the image) dominates the round-1 O=768 choice: ~25%
    # faster with equal-or-better measured fidelity on both scenes (the
    # near-integer warp resampling ratio is a fidelity sweet spot).
    from differender_tpu.fastpath import render_fast

    def make_sw(mode):
        if mode == "grad":
            @jax.jit
            def f(c, v, t):
                lf = jnp.asarray(lf0) + c * 1e-6
                g = jax.grad(lambda v_, t_: jnp.mean(render_fast(
                    v_, t_, lf, cfg_fast, intermediate=576,
                    planes_per_voxel=2.0).image ** 2),
                    argnums=(0, 1))(v, t)
                return c + 1 + g[0].sum() * 0
        else:
            @jax.jit
            def f(c, v, t):
                lf = jnp.asarray(lf0) + c * 1e-6
                img = render_fast(v, t, lf, cfg_fast, intermediate=576,
                                  planes_per_voxel=2.0).image
                return c + 1 + img.sum() * 0
        return f

    errors = {}
    try:
        sw_fwd_s = _chain_bench(make_sw("fwd"), n=2, args=(vol, tf))
        sw_step_s = _chain_bench(make_sw("grad"), n=2, args=(vol, tf))
    except Exception as e:
        sw_fwd_s = sw_step_s = None
        errors["shearwarp"] = f"{type(e).__name__}: {e}"[:300]
    try:
        # parity mode moves 7x more gathered bytes; smaller blocks keep the
        # intermediates inside HBM. Transient TPU infra errors -> None.
        parity_step_s = _chain_bench(make(cfg_parity, "grad"), n=1,
                                     args=(vol, tf))
    except Exception as e:
        parity_step_s = None
        errors["parity_mode"] = f"{type(e).__name__}: {e}"[:300]

    # Fidelity of the approximate shear-warp renderer vs the exact march at
    # the headline config — on the timing scene (uniform NOISE, worst case
    # for slab quadrature: no spatial coherence) AND a structured
    # soft-sphere scene representative of real volumes.
    sw_ssim = sw_linf = sw_ssim_sphere = sw_linf_sphere = None
    if sw_step_s is not None:
        try:
            from differender_tpu.losses import ssim as _ssim

            def fid(v):
                lf = jnp.asarray(lf0)
                exact_img = np.asarray(jax.jit(
                    lambda v_, t, l: render(v_, t, l, cfg_fast,
                                            sampling_rate=SR).image
                )(v, tf, lf))
                sw_img = np.asarray(jax.jit(
                    lambda v_, t, l: render_fast(v_, t, l, cfg_fast,
                                                 intermediate=576,
                                                 planes_per_voxel=2.0).image
                )(v, tf, lf))
                # losses.ssim expects (..., C, H, W)
                ss = float(_ssim(
                    jnp.asarray(np.moveaxis(sw_img, -1, 0)),
                    jnp.asarray(np.moveaxis(exact_img, -1, 0))))
                return ss, float(np.abs(sw_img - exact_img).max())

            sw_ssim, sw_linf = fid(vol)
            xs = np.linspace(-1, 1, VOL, dtype=np.float32)
            gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
            rr = np.sqrt(gx * gx + gy * gy + gz * gz)
            sphere = jnp.asarray(
                (1.0 / (1.0 + np.exp((rr - 0.55) * 12.0))).astype(np.float32))
            sw_ssim_sphere, sw_linf_sphere = fid(sphere)
        except Exception as e:
            errors["fidelity"] = f"{type(e).__name__}: {e}"[:300]

    try:
        cpu = measure_cpu_baseline()
        vs_baseline = cpu["cpu_step_s_extrapolated"] / step_s
    except Exception:
        vs_baseline = None

    # Headline = the framework's best renderer for the task (shear-warp when
    # it wins); the exact-march numbers are always in aux for transparency.
    # NOTE the headline vs_baseline is CROSS-RENDERER when shear-warp wins:
    # approximate shear-warp time vs the CPU *exact-march* proxy — the
    # like-for-like exact-march multiple and the shear-warp fidelity
    # (SSIM / L-inf vs exact) are in aux so the trade is visible here.
    best_s = min([s for s in (step_s, sw_step_s) if s])
    best_name = "shear-warp" if best_s == sw_step_s else "exact march"
    print(json.dumps({
        "metric": ("fwd+bwd steps/sec @ 256^3 vol, 512^2 img "
                   f"(best renderer: {best_name})"),
        "value": round(1.0 / best_s, 4),
        "unit": "steps/s",
        "vs_baseline": (round(vs_baseline * step_s / best_s, 2)
                        if vs_baseline else None),
        "aux": {
            "vs_baseline_note": ("cross-renderer: best-renderer time vs "
                                 "CPU exact-march proxy (see BASELINE.md)"
                                 if best_name == "shear-warp" else
                                 "like-for-like exact march vs CPU proxy"),
            "exact_march_steps_per_s": round(1.0 / step_s, 4),
            "exact_march_vs_baseline": (round(vs_baseline, 2)
                                        if vs_baseline else None),
            "fwd_nondiff_mrays_per_s": round(IMG * IMG / fwd_s / 1e6, 3),
            "fwd_nondiff_s": round(fwd_s, 4),
            "fwd_bwd_s": round(step_s, 4),
            "parity_mode_fwd_bwd_s": (round(parity_step_s, 4)
                                      if parity_step_s else None),
            "shearwarp_fwd_s": round(sw_fwd_s, 4) if sw_fwd_s else None,
            "shearwarp_fwd_bwd_s": (round(sw_step_s, 4)
                                    if sw_step_s else None),
            "shearwarp_ssim_vs_exact_noise_scene": (
                round(sw_ssim, 4) if sw_ssim is not None else None),
            "shearwarp_linf_vs_exact_noise_scene": (
                round(sw_linf, 4) if sw_linf is not None else None),
            "shearwarp_ssim_vs_exact_sphere_scene": (
                round(sw_ssim_sphere, 4)
                if sw_ssim_sphere is not None else None),
            "shearwarp_linf_vs_exact_sphere_scene": (
                round(sw_linf_sphere, 4)
                if sw_linf_sphere is not None else None),
            "errors": errors or None,
        },
    }))


if __name__ == "__main__":
    main()
