"""Headline benchmark (driver-run on TPU).

Metric (BASELINE.json): fwd+bwd steps/sec at 256^3 volume, 512^2 image,
plus forward Mrays/s.  Prints ONE JSON line.

Methodology notes (round 3):
  * Measurements chain a scalar through every iteration (the camera is
    perturbed by it), so no two executions see identical inputs — this
    defeats any transparent result caching in remote-TPU relays and forces
    a true device round per step.
  * The HEADLINE is the renderer with FULL reference semantics (the
    56-load central-difference parity stencil,
    `/root/reference/differender/volume_raycaster.py:191-203`), timed on
    the uniform-noise scene (no exploitable structure), against the SAME
    parity renderer on one CPU core — a like-for-like comparison with
    fidelity exact by construction.  Round 2's headline rode the
    approximate shear-warp renderer against an exact-renderer baseline
    (cross-renderer, SSIM 0.57 on the timed scene); shear-warp is now
    reported in ``aux`` with its fidelity, and is flagged eligible/
    ineligible by an SSIM >= 0.9 gate per scene.
  * Headline variance: N=3 independently-chained measurements; the JSON
    reports mean and spread (VERDICT r2 #7).
  * ``vs_baseline``: the reference publishes no numbers and Taichi is not
    installable here, so the baseline is THIS renderer on CPU (same
    parity mode), measured at a 3-point config ladder and extrapolated by
    a power-law fit in marched-sample count (VERDICT r2 #8; cached in
    BASELINE_MEASURED.json).  See BASELINE.md.
"""
import json
import os
import subprocess
import sys
import time

BASE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(BASE, "BASELINE_MEASURED.json")

VOL, IMG, MAX_SAMPLES, TF_RES, SR, BLOCK = 256, 512, 512, 128, 1.0, 16
# CPU proxy ladder (VERDICT r2 #8): multiple configs -> power-law fit in
# marched-sample count instead of the round-1 single-point linear scaling.
CPU_CONFIGS = [(64, 128, 128), (96, 192, 192), (128, 256, 256)]

_CPU_SCRIPT = r"""
import json, time, sys
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
sys.path.insert(0, %(base)r)
from differender_tpu import RenderConfig, render
from differender_tpu.transfer import get_tf
vol = jnp.asarray(np.random.default_rng(0).random((%(v)d,)*3, np.float32) * 0.5)
# Full reference semantics (parity stencil) — like-for-like with the
# TPU headline renderer.
cfg = RenderConfig(volume_shape=(%(v)d,)*3, image_shape=(%(i)d, %(i)d),
                   max_samples=%(ms)d, block_size=%(blk)d)
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
t0 = time.time(); n = %(n)d
for _ in range(n):
    c = step(c)
jax.block_until_ready(c)
print(json.dumps({'cpu_step_s': (time.time() - t0) / n}))
"""


def _run_cpu_point(v, i, ms, n=2, timeout=7200):
    script = _CPU_SCRIPT % dict(base=BASE, v=v, i=i, ms=ms, blk=BLOCK,
                                tf=TF_RES, sr=SR, n=n)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=timeout)
    return json.loads(out.stdout.strip().splitlines()[-1])["cpu_step_s"]


def measure_cpu_baseline():
    """CPU proxy with a measured scaling fit.

    Measures the exact-math renderer (1 CPU core) at the CPU_CONFIGS ladder
    and fits ``t = a * samples^p`` by log-log least squares; the headline
    divisor is the fit evaluated at the headline sample count.  The fit and
    the raw points are cached in BASELINE_MEASURED.json so re-benches (and
    the driver) never re-pay the CPU hours."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        if "fit_exponent" in data:
            return data
    points = []
    for v, i, ms in CPU_CONFIGS:
        t = _run_cpu_point(v, i, ms)
        points.append({"config": [v, i, ms], "samples": i * i * ms,
                       "step_s": t})
    import math
    xs = [math.log(p["samples"]) for p in points]
    ys = [math.log(p["step_s"]) for p in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    p_exp = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
             / sum((x - mx) ** 2 for x in xs))
    log_a = my - p_exp * mx
    target = IMG * IMG * MAX_SAMPLES
    extrapolated = math.exp(log_a + p_exp * math.log(target))
    data = {
        "cpu_points": points,
        "fit_exponent": p_exp,
        "fit_log_a": log_a,
        "target_samples": target,
        "cpu_step_s_extrapolated": extrapolated,
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


def _chain_samples(f, n, args=()):
    """N *individually timed* iterations of ONE chain (one warmup).

    The chain scalar carries across every sample, so no two executions —
    within or across samples — are identical; restarting the chain per
    sample would replay byte-identical executions that the remote-TPU
    relay may serve from cache (CLAUDE.md rule 4)."""
    import jax
    import jax.numpy as jnp
    c = jnp.float32(float(f(jnp.float32(0.0), *args)))
    out = []
    for _ in range(n):
        t0 = time.time()
        c = jnp.float32(float(f(c, *args)))
        out.append(time.time() - t0)
    return out


def _phantom(vol_res):
    from differender_tpu.utils.scenes import ct_phantom
    return ct_phantom(vol_res)


def _with_retries(fn, attempts=3, settle_s=45.0):
    """Run ``fn()`` retrying TRANSIENT remote-compile failures.

    The remote compile service intermittently drops connections or
    crashes its helper subprocess under load ("response body closed
    before all bytes were read" / "HTTP 500: tpu_compile_helper"), then
    recovers after idle (CLAUDE.md rule 6) — a round-4 bench run lost
    the phantom-policy AND 512^3 rungs to exactly this while the same
    programs had compiled fine hours earlier.  Only retry on those
    signatures; real compile errors (OOM, unsupported ops) re-raise
    immediately."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = ("remote_compile" in msg
                         and ("response body closed" in msg
                              or "HTTP 500" in msg
                              or "connection" in msg.lower()))
            if not transient or i == attempts - 1:
                raise
            last = e
            time.sleep(settle_s)
    raise last  # unreachable


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from differender_tpu import (RenderConfig, render, render_nondiff,
                                 render_nondiff_strips)
    from differender_tpu.transfer import get_tf

    key = jax.random.PRNGKey(0)
    vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
    vol_phantom = jnp.asarray(_phantom(VOL))
    tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)
    errors = {}

    def make(cfg, mode, sr=SR, render_fn=None):
        rfn = render if render_fn is None else render_fn
        if mode == "grad":
            @jax.jit
            def f(c, v, t):
                lf = jnp.asarray(lf0) + c * 1e-6
                g = jax.grad(lambda v_, t_: jnp.mean(
                    rfn(v_, t_, lf, cfg, sampling_rate=sr).image ** 2),
                    argnums=(0, 1))(v, t)
                return c + 1 + g[0].sum() * 0
        else:
            @jax.jit
            def f(c, v, t):
                lf = jnp.asarray(lf0) + c * 1e-6
                img = render_nondiff(v, t, lf, cfg,
                                     sampling_rate=sr).image
                return c + 1 + img.sum() * 0
        return f

    # HEADLINE config: FULL reference semantics — the 56-load parity
    # stencil, ERT, supercell-64 table with grouped parity sampling (one
    # 64-wide row gather serves 4 consecutive samples incl. their whole
    # 7-point stencils — the round-3 change that took parity fwd+bwd from
    # 29.9 s to ~4.5 s).  Round 4: the GRADIENT step uses
    # march_vjp="sorted" (sorted-window box scatter + fold, replacing the
    # 200 ns/row AD scatter into the table cotangent) at block 64 (fewer
    # march blocks amortize the placement loop's fixed cost; sweep in
    # experiments/r4_sorted_march_results.jsonl).  Forward keeps block 16
    # (finer ERT block skip; the forward graph is otherwise identical).
    cfg_exact = RenderConfig(volume_shape=(VOL,) * 3, image_shape=(IMG, IMG),
                             max_samples=MAX_SAMPLES, block_size=BLOCK,
                             march_table="super64")
    cfg_grad = cfg_exact.replace(block_size=64, march_vjp="sorted")
    # Analytic mode also moves to the sorted VJP (round-4 config change:
    # rounds 1-3 measured analytic at block 16 / march_vjp="ad"); block 32
    # is its measured sweep point (analytic_sorted_b32: 2.71 s vs AD
    # 4.69-4.73 s, r4_sorted_march_results.jsonl).
    cfg_analytic = cfg_grad.replace(analytic_normals=True, block_size=32)

    # N=3 individually-timed iterations of one chained run (variance,
    # r2 #7; the chain carries across samples — see _chain_samples).
    # Round 4: the headline rides the SCENE POLICY (choose_diff_renderer),
    # which routes the fast-saturating noise scene to the EXACT alive-ray
    # compacted march (compact_after; 1.52 -> 1.06 s measured, r16 rows in
    # experiments/r8_headline_results.jsonl).  The policy probe runs once
    # per scene, outside the timed chain — exactly how a training loop
    # amortizes it.
    from differender_tpu import choose_diff_renderer
    headline_policy = "plain"
    step_f = make(cfg_grad, "grad")
    try:
        rfn_n, headline_policy = choose_diff_renderer(
            vol_noise, tf, jnp.asarray(lf0), cfg_grad, sampling_rate=SR)
        if headline_policy != "plain":
            step_f = make(cfg_grad, "grad", render_fn=rfn_n)
    except Exception as e:
        errors["headline_policy"] = f"{type(e).__name__}: {e}"[:300]
    step_samples = _chain_samples(step_f, n=3, args=(vol_noise, tf))
    step_s = sum(step_samples) / len(step_samples)
    # Phantom scene rides the SCENE POLICY (round-4 verdict item 2): on
    # structured content choose_diff_renderer picks the depth-sorted
    # chunked march (exact — permutation + the same prefix-closed skip),
    # so each depth group's ERT block skip fires at its own depth instead
    # of waiting for the deepest ray in the image.
    phantom_policy = "plain"
    try:
        def _phantom_rung():
            rfn, pol = choose_diff_renderer(
                vol_phantom, tf, jnp.asarray(lf0), cfg_grad,
                sampling_rate=SR)
            step_ph_f = (make(cfg_grad, "grad") if pol == "plain"
                         else make(cfg_grad, "grad", render_fn=rfn))
            return pol, _chain_bench(step_ph_f, n=1,
                                     args=(vol_phantom, tf))
        phantom_policy, step_phantom_s = _with_retries(_phantom_rung)
    except Exception as e:
        errors["phantom_policy"] = f"{type(e).__name__}: {e}"[:300]
        phantom_policy = "plain"
        step_phantom_s = _chain_bench(make(cfg_grad, "grad"), n=1,
                                      args=(vol_phantom, tf))
    fwd_s = _chain_bench(make(cfg_exact, "fwd"), n=2, args=(vol_noise, tf))
    try:
        analytic_step_s = _chain_bench(make(cfg_analytic, "grad"), n=1,
                                       args=(vol_noise, tf))
    except Exception as e:
        analytic_step_s = None
        errors["analytic_mode"] = f"{type(e).__name__}: {e}"[:300]

    # The reference's flagship inference workload: sampling_rate 16
    # (`render_nondiff.py:20,27`) — empty-space occupancy jumps + strip
    # execution for the 800^2 original (round 2: 45.5 s at 512^2, crash at
    # 800^2).
    sr16_512_s = sr16_800_s = None
    try:
        sr16_512_s = _chain_bench(make(cfg_exact.replace(
            analytic_normals=True), "fwd", sr=16.0), n=1,
            args=(vol_phantom, tf))
    except Exception as e:
        errors["sr16_512"] = f"{type(e).__name__}: {e}"[:300]
    try:
        cfg800 = cfg_exact.replace(image_shape=(800, 800),
                                   analytic_normals=True)

        def f800(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render_nondiff_strips(v, t, lf, cfg800,
                                        sampling_rate=16.0,
                                        n_strips=4).image
            return c + 1 + img.sum() * 0

        sr16_800_s = _chain_bench(f800, n=1, args=(vol_phantom, tf))
    except Exception as e:
        errors["sr16_800"] = f"{type(e).__name__}: {e}"[:300]

    # shear-warp fast path (slab-aligned quadrature, all-MXU resampling) —
    # reported SEPARATELY from the headline with its measured fidelity
    # (round-2 headline rode it cross-renderer at noise-scene SSIM 0.57;
    # see the verdict).  O=576: the near-integer warp ratio sweet spot.
    from differender_tpu.fastpath import render_fast

    def make_sw(mode):
        if mode == "grad":
            @jax.jit
            def f(c, v, t):
                lf = jnp.asarray(lf0) + c * 1e-6
                g = jax.grad(lambda v_, t_: jnp.mean(render_fast(
                    v_, t_, lf, cfg_exact, intermediate=576,
                    planes_per_voxel=2.0).image ** 2),
                    argnums=(0, 1))(v, t)
                return c + 1 + g[0].sum() * 0
        else:
            @jax.jit
            def f(c, v, t):
                lf = jnp.asarray(lf0) + c * 1e-6
                img = render_fast(v, t, lf, cfg_exact, intermediate=576,
                                  planes_per_voxel=2.0).image
                return c + 1 + img.sum() * 0
        return f

    try:
        sw_fwd_s = _chain_bench(make_sw("fwd"), n=2, args=(vol_noise, tf))
        sw_step_s = _chain_bench(make_sw("grad"), n=2, args=(vol_noise, tf))
        sw_step_phantom_s = _chain_bench(make_sw("grad"), n=2,
                                         args=(vol_phantom, tf))
    except Exception as e:
        sw_fwd_s = sw_step_s = sw_step_phantom_s = None
        errors["shearwarp"] = f"{type(e).__name__}: {e}"[:300]

    # Shear-warp fidelity vs the exact render on both scenes (SSIM fixed in
    # round 3 — losses.ssim previously emitted >1 on TPU).
    fid_out = {}
    if sw_step_s is not None:
        try:
            from differender_tpu.losses import ssim as _ssim

            def fid(v):
                lf = jnp.asarray(lf0)
                exact_img = np.asarray(jax.jit(
                    lambda v_, t, l: render(v_, t, l, cfg_exact,
                                            sampling_rate=SR).image
                )(v, tf, lf))
                sw_img = np.asarray(jax.jit(
                    lambda v_, t, l: render_fast(v_, t, l, cfg_exact,
                                                 intermediate=576,
                                                 planes_per_voxel=2.0).image
                )(v, tf, lf))
                ss = float(_ssim(
                    jnp.asarray(np.moveaxis(sw_img, -1, 0)),
                    jnp.asarray(np.moveaxis(exact_img, -1, 0))))
                return ss, float(np.abs(sw_img - exact_img).max())

            for scene, v in (("noise", vol_noise), ("phantom", vol_phantom)):
                ss, li = fid(v)
                fid_out[f"shearwarp_ssim_vs_exact_{scene}"] = round(ss, 4)
                fid_out[f"shearwarp_linf_vs_exact_{scene}"] = round(li, 4)
                fid_out[f"shearwarp_meets_ssim_gate_{scene}"] = bool(
                    ss >= 0.9)
        except Exception as e:
            errors["fidelity"] = f"{type(e).__name__}: {e}"[:300]

    # Shear-warp FIDELITY POLICY (round-4 verdict item 5): the shipped
    # auto-densify ladder (`fastpath.choose_fast_params`) walks
    # (intermediate, planes_per_voxel) rungs until the scene passes the
    # SSIM >= 0.9 gate, else falls back to the exact renderer — so the
    # artifact records, per scene, either a passing density or an
    # explicit exact-fallback instead of a silently-failing flag.
    sw_policy = {}
    try:
        from differender_tpu.fastpath import choose_fast_params
        for scene, v in (("noise", vol_noise), ("phantom", vol_phantom)):
            info = choose_fast_params(v, tf, jnp.asarray(lf0), cfg_exact)
            sw_policy[f"shearwarp_policy_{scene}"] = {
                "renderer": info["renderer"],
                "intermediate": info["intermediate"],
                "planes_per_voxel": info["planes_per_voxel"],
                "ssim": info["ssim"],
                "rungs_tried": len(info["trace"]),
            }
    except Exception as e:
        errors["shearwarp_policy"] = f"{type(e).__name__}: {e}"[:300]

    # Roofline context (the honest MFU analogue for a gather-bound
    # workload): the march forward is bounded by the measured 64-wide-row
    # gather price (~10.5 ns/idx, experiments/row_scatter_results.jsonl
    # gather_grid W=64 rows) and the sorted backward by the measured
    # sorted-window placement price (~29.4 ns/row,
    # r4_full_block_sorted_windows).  The floor charges one row gather per
    # supercell step-group on the forward and one placement row per group
    # on the backward (remat saves the march residuals, so the backward
    # re-issues NO gathers).  "pct_of_attainable" divides the ERT-aware
    # floor by the measured step time.
    roofline = None
    try:
        from differender_tpu.geometry import make_rays
        G = cfg_grad.supercell_group(SR)
        GATHER_NS, PLACE_NS = 10.5, 29.4

        @jax.jit
        def _ns_nominal(lf):
            rays = make_rays(lf, cfg_grad, SR)
            return jnp.sum(jnp.minimum(rays.n_samples, MAX_SAMPLES))

        @jax.jit
        def _ns_ert(v, t, lf):
            return jnp.sum(render(v, t, lf, cfg_grad,
                                  sampling_rate=SR).valid_steps)

        nominal = float(_ns_nominal(jnp.asarray(lf0)))
        eff = float(_ns_ert(vol_noise, tf, jnp.asarray(lf0)))
        floor_nom = nominal / G * (GATHER_NS + PLACE_NS) * 1e-9
        floor_ert = eff / G * (GATHER_NS + PLACE_NS) * 1e-9
        roofline = {
            "gather_floor_ns_per_row": GATHER_NS,
            "sorted_place_floor_ns_per_row": PLACE_NS,
            "supercell_group": G,
            "marched_samples_nominal": int(nominal),
            "marched_samples_ert": int(eff),
            "fwd_bwd_floor_s_nominal": round(floor_nom, 4),
            "fwd_bwd_floor_s_ert": round(floor_ert, 4),
            "fwd_bwd_pct_of_attainable": round(100.0 * floor_ert / step_s,
                                               1),
        }
    except Exception as e:
        errors["roofline"] = f"{type(e).__name__}: {e}"[:300]

    try:
        cpu = measure_cpu_baseline()
        vs_baseline = cpu["cpu_step_s_extrapolated"] / step_s
    except Exception as e:
        vs_baseline = None
        errors["cpu_baseline"] = f"{type(e).__name__}: {e}"[:300]

    # 512^3 gradient rung (round 4): the auto-selected blockwise split
    # backward — the only form whose programs all fit the remote compile
    # budget at this scale (BASELINE.md round-4 section).  Host-level
    # loop, so timed directly (still chained: the carry perturbs the
    # camera between steps).  Placed LAST: it allocates a 512 MB volume
    # plus multi-GB march tables, and a failure here must not cost the
    # headline numbers.
    bw512 = None
    try:
        from differender_tpu.render import value_and_grad_render
        cfg512 = RenderConfig(volume_shape=(512,) * 3,
                              image_shape=(IMG, IMG),
                              max_samples=MAX_SAMPLES, block_size=64,
                              march_vjp="sorted", march_table="super64s2")
        assert cfg512.use_blockwise_grad(), "expected the blockwise path"
        vol512 = jax.random.uniform(jax.random.PRNGKey(1), (512,) * 3,
                                    jnp.float32) * 0.5

        def _loss512(out):
            return jnp.mean(out.image ** 2)

        def _step512(c):
            lf = jnp.asarray(lf0 + np.float32(c) * 1e-6)
            loss, (dv, dt) = value_and_grad_render(
                vol512, tf, lf, cfg512, _loss512)
            jax.block_until_ready(dv)
            return c + 1.0 + float(loss) * 0.0

        t0 = time.time()
        c512 = _with_retries(lambda: _step512(0.0), settle_s=60.0)
        bw512_cold = time.time() - t0
        warm = []
        for _ in range(2):
            t0 = time.time()
            c512 = _step512(c512)
            warm.append(time.time() - t0)
        bw512 = {
            "fwd_bwd_s_warm": [round(s, 3) for s in warm],
            "fwd_bwd_s_cold": round(bw512_cold, 1),
            "strategy": "blockwise split sorted (auto-selected by "
                        "config.use_blockwise_grad)",
            "monolithic_ad_s_r3": 9.82,
        }
        del vol512
    except Exception as e:
        errors["bw512"] = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps({
        "metric": ("fwd+bwd steps/sec @ 256^3 vol, 512^2 img "
                   "(exact reference-semantics renderer)"),
        "value": round(1.0 / step_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "aux": {
            "vs_baseline_note": (
                "like-for-like: the same parity renderer on 1 CPU core, "
                "3-point power-law fit (BASELINE_MEASURED.json)"),
            "fwd_bwd_s_mean": round(step_s, 4),
            "fwd_bwd_s_samples": [round(s, 4) for s in step_samples],
            "grad_config": "march_vjp=sorted block=64 (fwd: ad-equivalent "
                           "forward graph at block 16)",
            "headline_policy": headline_policy,
            "fwd_bwd_s_phantom_scene": round(step_phantom_s, 4),
            "phantom_scene_policy": phantom_policy,
            "fwd_nondiff_mrays_per_s": round(IMG * IMG / fwd_s / 1e6, 3),
            "fwd_nondiff_s": round(fwd_s, 4),
            "analytic_mode_fwd_bwd_s": (round(analytic_step_s, 4)
                                        if analytic_step_s else None),
            "ref_workload_sr16_512_s": (round(sr16_512_s, 4)
                                        if sr16_512_s else None),
            "ref_workload_sr16_800_s": (round(sr16_800_s, 4)
                                        if sr16_800_s else None),
            "shearwarp_fwd_s": round(sw_fwd_s, 4) if sw_fwd_s else None,
            "shearwarp_fwd_bwd_s": (round(sw_step_s, 4)
                                    if sw_step_s else None),
            "shearwarp_fwd_bwd_s_phantom_scene": (
                round(sw_step_phantom_s, 4) if sw_step_phantom_s else None),
            "shearwarp_steps_per_s": (round(1.0 / sw_step_s, 4)
                                      if sw_step_s else None),
            **fid_out,
            **sw_policy,
            "fwd_bwd_512cubed_blockwise": bw512,
            "roofline": roofline,
            "errors": errors or None,
        },
    }))


if __name__ == "__main__":
    main()
