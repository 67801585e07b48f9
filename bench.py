"""Headline benchmark (driver-run on TPU).

Metric (BASELINE.json): fwd+bwd steps/sec at 256^3 volume, 512^2 image,
plus forward Mrays/s.

Output protocol (round 5, VERDICT r4 item 1): the benchmark prints a
COMPLETE JSON line to stdout the moment the headline chain is measured,
then re-prints an updated complete line after every additional rung —
**the last line wins**.  A driver timeout therefore costs only tail
rungs, never the headline (round 4's artifact was rc=124/parsed=null
because a single final print sat behind ~10 serial rungs).  stdout
carries ONLY JSON lines; progress notes go to stderr.

A wall-clock budget (env ``BENCH_BUDGET_S``, default 2400 s) gates every
rung after the headline: a rung whose estimated cost exceeds the
remaining budget is skipped and recorded in ``aux.skipped`` with its
estimate, so the artifact is honest about what was not measured.  (The
round-5 validation run measured the full ladder at ~2500 s with cold
compiles; at 1500 s the tail four rungs skip.  Because every line is a
complete artifact, a driver-side timeout still leaves the newest
finished rung set parseable — the budget only controls how politely the
run ends.)

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


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _run_cpu_point(v, i, ms, n=2, timeout=7200):
    script = _CPU_SCRIPT % dict(base=BASE, v=v, i=i, ms=ms, blk=BLOCK,
                                tf=TF_RES, sr=SR, n=n)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=timeout)
    return json.loads(out.stdout.strip().splitlines()[-1])["cpu_step_s"]


def measure_cpu_baseline(allow_measure=True):
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
    if not allow_measure:
        raise RuntimeError("no cached CPU baseline and measuring is "
                           "outside the wall-clock budget")
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
    programs had compiled fine hours earlier.

    CAVEAT (ADVICE r4): oversized graphs crash the helper
    DETERMINISTICALLY with the same "HTTP 500" signature, so the
    signature alone cannot distinguish transient congestion from a
    too-big program.  To cap the cost of retrying a deterministic
    failure, the FIRST retry is cheap (5 s); only the later retries pay
    the long settle sleep.  Other compile errors (OOM, unsupported ops)
    re-raise immediately."""
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
            time.sleep(5.0 if i == 0 else settle_s)
    raise last  # unreachable


class _Bench:
    """Incremental-emission bench state (VERDICT r4 item 1).

    ``emit()`` prints the full JSON document as one stdout line; it is
    called after the headline and after every subsequent rung, so the
    newest complete artifact is always the LAST stdout line and a driver
    timeout only truncates tail rungs."""

    def __init__(self):
        self.t0 = time.time()
        self.budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))
        self.skip_env = {s for s in
                         os.environ.get("BENCH_SKIP", "").split(",") if s}
        self.aux = {}
        self.errors = {}
        self.skipped = {}
        self.step_s = None
        self.vs_baseline = None

    def elapsed(self):
        return time.time() - self.t0

    def remaining(self):
        return self.budget_s - self.elapsed()

    def rung(self, name, est_cost_s, fn):
        """Run one optional rung under the budget; emit afterwards."""
        if name in self.skip_env:
            self.skipped[name] = {"reason": "BENCH_SKIP env"}
            self.emit()
            return
        if self.remaining() < est_cost_s:
            self.skipped[name] = {
                "est_cost_s": est_cost_s,
                "remaining_s": round(self.remaining(), 1),
            }
            _note(f"SKIP {name}: est {est_cost_s}s > "
                  f"remaining {self.remaining():.0f}s")
            self.emit()
            return
        _note(f"rung {name} (est {est_cost_s}s, "
              f"remaining {self.remaining():.0f}s)")
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            self.errors[name] = f"{type(e).__name__}: {e}"[:300]
            _note(f"rung {name} FAILED: {self.errors[name]}")
        self.emit()

    def emit(self):
        doc = {
            "metric": ("fwd+bwd steps/sec @ 256^3 vol, 512^2 img "
                       "(exact reference-semantics renderer)"),
            "value": (round(1.0 / self.step_s, 4)
                      if self.step_s else None),
            "unit": "steps/s",
            "vs_baseline": (round(self.vs_baseline, 2)
                            if self.vs_baseline else None),
            "aux": {
                "vs_baseline_note": (
                    "like-for-like: the same parity renderer on 1 CPU "
                    "core, 3-point power-law fit "
                    "(BASELINE_MEASURED.json)"),
                **self.aux,
                "skipped": self.skipped or None,
                "errors": self.errors or None,
                "bench_elapsed_s": round(self.elapsed(), 1),
                "bench_budget_s": self.budget_s,
            },
        }
        print(json.dumps(doc), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from differender_tpu import (RenderConfig, render, render_nondiff,
                                 render_nondiff_strips)
    from differender_tpu.transfer import get_tf

    B = _Bench()
    key = jax.random.PRNGKey(0)
    vol_noise = jax.random.uniform(key, (VOL,) * 3, jnp.float32) * 0.5
    tf = jnp.asarray(np.asarray(get_tf("tf1", TF_RES)))
    lf0 = np.array([1.2, 0.8, 2.0], np.float32)

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

    # ---- HEADLINE (unconditional; runs first; emitted immediately) ----
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
        B.errors["headline_policy"] = f"{type(e).__name__}: {e}"[:300]
    _note("headline chain (policy: %s)" % headline_policy)
    step_samples = _chain_samples(step_f, n=3, args=(vol_noise, tf))
    step_s = sum(step_samples) / len(step_samples)
    B.step_s = step_s
    B.aux["fwd_bwd_s_mean"] = round(step_s, 4)
    B.aux["fwd_bwd_s_samples"] = [round(s, 4) for s in step_samples]
    B.aux["grad_config"] = ("march_vjp=sorted block=64 (fwd: ad-equivalent "
                            "forward graph at block 16)")
    B.aux["headline_policy"] = headline_policy
    try:
        # Cached fit only (no CPU hours inside the TPU bench window).
        cpu = measure_cpu_baseline(allow_measure=B.remaining() > 3600)
        B.vs_baseline = cpu["cpu_step_s_extrapolated"] / step_s
    except Exception as e:
        B.errors["cpu_baseline"] = f"{type(e).__name__}: {e}"[:300]
    B.emit()  # <- headline artifact exists from this point on

    # ---- Optional rungs, budget-gated, cheapest-information-first ----
    vol_phantom = jnp.asarray(_phantom(VOL))

    def rung_phantom():
        # Phantom scene rides the SCENE POLICY (round-4 verdict item 2): on
        # structured content choose_diff_renderer picks the depth-sorted
        # chunked march (exact — permutation + the same prefix-closed
        # skip), so each depth group's ERT block skip fires at its own
        # depth instead of waiting for the deepest ray in the image.
        def _phantom_rung():
            rfn, pol = choose_diff_renderer(
                vol_phantom, tf, jnp.asarray(lf0), cfg_grad,
                sampling_rate=SR)
            step_ph_f = (make(cfg_grad, "grad") if pol == "plain"
                         else make(cfg_grad, "grad", render_fn=rfn))
            return pol, _chain_bench(step_ph_f, n=1,
                                     args=(vol_phantom, tf))
        pol, t = _with_retries(_phantom_rung)
        B.aux["fwd_bwd_s_phantom_scene"] = round(t, 4)
        B.aux["phantom_scene_policy"] = pol

    B.rung("phantom_policy", 240, rung_phantom)

    def rung_fwd():
        fwd_s = _chain_bench(make(cfg_exact, "fwd"), n=2,
                             args=(vol_noise, tf))
        B.aux["fwd_nondiff_mrays_per_s"] = round(IMG * IMG / fwd_s / 1e6, 3)
        B.aux["fwd_nondiff_s"] = round(fwd_s, 4)

    B.rung("fwd_nondiff", 120, rung_fwd)

    def rung_sr16_512():
        # The reference's flagship inference workload: sampling_rate 16
        # (`render_nondiff.py:20,27`) — empty-space occupancy jumps.
        t = _chain_bench(make(cfg_exact.replace(
            analytic_normals=True), "fwd", sr=16.0), n=1,
            args=(vol_phantom, tf))
        B.aux["ref_workload_sr16_512_s"] = round(t, 4)

    B.rung("sr16_512", 120, rung_sr16_512)

    def rung_sr16_800():
        # Strip execution for the 800^2 original (round 2: 45.5 s at
        # 512^2, crash at 800^2 before strips).
        cfg800 = cfg_exact.replace(image_shape=(800, 800),
                                   analytic_normals=True)

        def f800(c, v, t):
            lf = jnp.asarray(lf0) + c * 1e-6
            img = render_nondiff_strips(v, t, lf, cfg800,
                                        sampling_rate=16.0,
                                        n_strips=4).image
            return c + 1 + img.sum() * 0

        t = _chain_bench(f800, n=1, args=(vol_phantom, tf))
        B.aux["ref_workload_sr16_800_s"] = round(t, 4)

    B.rung("sr16_800", 180, rung_sr16_800)

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

    def rung_shearwarp():
        sw_fwd_s = _chain_bench(make_sw("fwd"), n=2, args=(vol_noise, tf))
        sw_step_s = _chain_bench(make_sw("grad"), n=2, args=(vol_noise, tf))
        sw_step_ph = _chain_bench(make_sw("grad"), n=2,
                                  args=(vol_phantom, tf))
        B.aux["shearwarp_fwd_s"] = round(sw_fwd_s, 4)
        B.aux["shearwarp_fwd_bwd_s"] = round(sw_step_s, 4)
        B.aux["shearwarp_fwd_bwd_s_phantom_scene"] = round(sw_step_ph, 4)
        B.aux["shearwarp_steps_per_s"] = round(1.0 / sw_step_s, 4)

    B.rung("shearwarp", 240, rung_shearwarp)

    def rung_fidelity():
        # Shear-warp fidelity vs the exact render on both scenes (SSIM
        # fixed in round 3 — losses.ssim previously emitted >1 on TPU).
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
            B.aux[f"shearwarp_ssim_vs_exact_{scene}"] = round(ss, 4)
            B.aux[f"shearwarp_linf_vs_exact_{scene}"] = round(li, 4)
            B.aux[f"shearwarp_meets_ssim_gate_{scene}"] = bool(ss >= 0.9)

    B.rung("fidelity", 180, rung_fidelity)

    def rung_sw_policy():
        # Shear-warp FIDELITY POLICY (round-4 verdict item 5): the shipped
        # auto-densify ladder (`fastpath.choose_fast_params`) walks
        # (intermediate, planes_per_voxel) rungs until the scene passes
        # the SSIM >= 0.9 gate, else falls back to the exact renderer —
        # so the artifact records, per scene, either a passing density or
        # an explicit exact-fallback instead of a silently-failing flag.
        from differender_tpu.fastpath import choose_fast_params
        for scene, v in (("noise", vol_noise), ("phantom", vol_phantom)):
            info = choose_fast_params(v, tf, jnp.asarray(lf0), cfg_exact)
            B.aux[f"shearwarp_policy_{scene}"] = {
                "renderer": info["renderer"],
                "intermediate": info["intermediate"],
                "planes_per_voxel": info["planes_per_voxel"],
                "ssim": info["ssim"],
                "rungs_tried": len(info["trace"]),
            }

    B.rung("shearwarp_policy", 240, rung_sw_policy)

    def rung_roofline():
        # Roofline context (the honest MFU analogue for a gather-bound
        # workload): the march forward is bounded by the measured
        # 64-wide-row gather price (~10.5 ns/idx,
        # experiments/row_scatter_results.jsonl gather_grid W=64 rows) and
        # the sorted backward by the measured sorted-window placement
        # price (~29.4 ns/row, r4_full_block_sorted_windows).  The floor
        # charges one row gather per supercell step-group on the forward
        # and one placement row per group on the backward (remat saves
        # the march residuals, so the backward re-issues NO gathers).
        # "pct_of_attainable" divides the ERT-aware floor by the measured
        # step time.
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
        B.aux["roofline"] = {
            "gather_floor_ns_per_row": GATHER_NS,
            "sorted_place_floor_ns_per_row": PLACE_NS,
            "supercell_group": G,
            "marched_samples_nominal": int(nominal),
            "marched_samples_ert": int(eff),
            "fwd_bwd_floor_s_nominal": round(floor_nom, 4),
            "fwd_bwd_floor_s_ert": round(floor_ert, 4),
            "fwd_bwd_pct_of_attainable": round(
                100.0 * floor_ert / B.step_s, 1),
        }

    B.rung("roofline", 120, rung_roofline)

    def rung_analytic():
        # Aux reference point only (analytic normals measure SLOWER than
        # the parity stencil — BASELINE.md round-3 cont.); late in the
        # ladder so a budget squeeze drops it before the distinctive
        # shear-warp/fidelity/reference-workload rungs.
        t = _chain_bench(make(cfg_analytic, "grad"), n=1,
                         args=(vol_noise, tf))
        B.aux["analytic_mode_fwd_bwd_s"] = round(t, 4)

    B.rung("analytic_mode", 180, rung_analytic)

    def rung_bw512():
        # 512^3 gradient rung (round 4): the auto-selected blockwise split
        # backward — the only form whose programs all fit the remote
        # compile budget at this scale (BASELINE.md round-4 section).
        # Host-level loop, so timed directly (still chained: the carry
        # perturbs the camera between steps).  Placed LAST: it allocates a
        # 512 MB volume plus multi-GB march tables, and a failure here
        # must not cost the headline numbers (they are already emitted).
        from differender_tpu.render import value_and_grad_render
        # block 32 is the MEASURED blockwise config (r12 rows: cold 215 s,
        # warm 9.5-9.6 s); the round-4 bench's block-64 variant turned out
        # NOT to compile (helper exit 1 — caught when this rung first
        # actually ran, round 5).
        cfg512 = RenderConfig(volume_shape=(512,) * 3,
                              image_shape=(IMG, IMG),
                              max_samples=MAX_SAMPLES, block_size=32,
                              march_vjp="sorted", march_table="super64s2")
        assert cfg512.use_blockwise_grad(), "expected the blockwise path"
        vol512 = jax.random.uniform(jax.random.PRNGKey(1), (512,) * 3,
                                    jnp.float32) * 0.5

        def _loss512(out):
            return jnp.mean(out.image ** 2)

        # ADVICE r4: time only the SUCCESSFUL attempt (the retry wrapper
        # sits outside the timer) and record how many retries it took.
        retries = {"n": 0}
        cold_s = {"v": None}

        def _step512(c):
            lf = jnp.asarray(lf0 + np.float32(c) * 1e-6)
            loss, (dv, dt) = value_and_grad_render(
                vol512, tf, lf, cfg512, _loss512)
            jax.block_until_ready(dv)
            return c + 1.0 + float(loss) * 0.0

        def _cold():
            retries["n"] += 1
            t0 = time.time()
            c = _step512(0.0)
            cold_s["v"] = time.time() - t0
            return c

        c512 = _with_retries(_cold, settle_s=60.0)
        warm = []
        for _ in range(2):
            t0 = time.time()
            c512 = _step512(c512)
            warm.append(time.time() - t0)
        B.aux["fwd_bwd_512cubed_blockwise"] = {
            "fwd_bwd_s_warm": [round(s, 3) for s in warm],
            "fwd_bwd_s_cold": round(cold_s["v"], 1),
            "cold_attempts": retries["n"],
            "strategy": "blockwise split sorted (auto-selected by "
                        "config.use_blockwise_grad)",
            "monolithic_ad_s_r3": 9.82,
        }
        del vol512

    B.rung("bw512", 500, rung_bw512)

    B.emit()


if __name__ == "__main__":
    main()
