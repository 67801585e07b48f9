"""The ray-march renderer: differentiable and fast inference paths.

This is the functional, TPU-native replacement for the reference's
``raycast``/``raycast_nondiff``/``get_final_image*`` Taichi kernels
(`/root/reference/differender/volume_raycaster.py:261-372`) and for its
``(W, H, max_samples)`` render tape (`:82,102-103`).

Key design departures (TPU-first, see SURVEY §7):
  * No materialized tape.  The differentiable march is a ``lax.scan`` over
    fixed-size step blocks with the accumulated RGBA as carry; each block is
    wrapped in ``jax.checkpoint`` so reverse-mode AD re-computes sample values
    instead of storing O(H*W*S) state.  Memory: O(H*W * S/block) checkpoints.
  * Early-ray termination / per-ray sample counts become lane masks (the
    recurrence ``acc' = acc + active * (1-acc.a) * shaded`` is exactly the
    reference's tape recurrence `:300-306` including the copy-forward branch).
  * The non-differentiable path adds a *global* block-level early exit via
    ``lax.while_loop`` — once every ray is terminated the march stops.
  * Batching is ``jax.vmap`` (see :mod:`differender_tpu.raycaster`), not the
    reference's serial host loop (`:418-427`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .geometry import RayBundle, MarchParams, make_rays, march_params
from .sampling import (apply_tf, apply_tf_dot_soa, apply_tf_soa, cell_table,
                       sample_cell_analytic, sample_cell_parity,
                       sample_soa_analytic, sample_soa_parity,
                       sample_super_analytic, sample_super_parity,
                       sample_with_gradient, sample_with_gradient_analytic,
                       supercell_table, tf_table8)
from .shading import shade, shade_soa

Array = jax.Array


class RenderOutput(NamedTuple):
    """Functional replacement for ``output_rgba`` + diagnostics fields
    (`/root/reference/differender/volume_raycaster.py:83-89`)."""

    image: Array          # (H, W, 4) RGBA, image-oriented (row 0 = top)
    valid_steps: Array    # (H, W) int32, reference `valid_sample_step_count`
    n_samples: Array      # (H, W) int32, reference `sample_step_nums`

    @property
    def max_valid_steps(self) -> Array:
        """Reference ``max_valid_sample_step_count``
        (`/root/reference/differender/volume_raycaster.py:370-372`)."""
        return jnp.max(self.valid_steps - 1)


def _eval_block(volume, tf, rays: RayBundle, params: MarchParams, steps,
                sampling_rate, config: RenderConfig, clamp_light: bool):
    """Evaluate K march steps AT ONCE (batched over a leading step axis).

    TPU-first design: per-step kernels on (H, W) tensors are launch-latency
    bound; batching K steps gives XLA (K, H, W)-shaped fusions and one large
    gather per block.  Sample evaluation is step-independent — only the
    compositing recurrence is sequential, and that is handled in closed form
    by :func:`composite_block`.

    ``steps`` may be (K,) shared across rays or (K, H, W) per-ray (used by
    the volume-sharded segment march).
    Returns (shaded (K,H,W,4), tf_alpha (K,H,W), in_range (K,H,W), pos).
    """
    steps3 = steps if steps.ndim == 3 else steps[:, None, None]
    t = params.t0[None] + steps3.astype(jnp.float32) * params.dt[None]
    pos = rays.origin + t[..., None] * rays.dirs[None]           # (K, H, W, 3)
    if config.analytic_normals:
        intensity, grad = sample_with_gradient_analytic(
            volume, pos, config.normal_delta)
    else:
        intensity, grad = sample_with_gradient(volume, pos,
                                               config.normal_delta)
    sample_rgba = apply_tf(tf, intensity)                        # (K, H, W, 4)
    shaded = shade(pos, grad, sample_rgba, rays.dirs[None], rays.origin,
                   sampling_rate, config, clamp_light=clamp_light)
    in_range = ((steps3 < rays.n_samples[None])
                & (steps3 < config.max_samples))
    return shaded, sample_rgba[..., 3], in_range, pos


def _exclusive_cumprod(x, axis=0):
    """[1, x0, x0*x1, ...] along ``axis``."""
    p = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jax.lax.slice_in_dim(p, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(p, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


def composite_block(acc, cnt, shaded, eligible, config: RenderConfig,
                    ert: bool = True):
    """Closed-form front-to-back composite of a block of K steps.

    Exactly reproduces the reference's sequential tape recurrence
    (`/root/reference/differender/volume_raycaster.py:300-306`) including
    early-ray termination: with transmittance ``T = 1 - acc.a`` the
    recurrence is a product/weighted-sum form,

        ``T_s = T_{s-1} * (1 - a_s)``,  ``rgb += T_{s-1} * shaded_rgb_s``,

    and the ERT gate ``acc_{s-1}.a < 0.99``  <=>  ``T_{s-1} > 0.01`` is
    *prefix-closed* (T is non-increasing, ineligible steps contribute a=0),
    so gates computed from the ungated cumulative transmittance equal the
    sequential gates.  This removes the sequential dependency from all the
    heavy work; only cumprod/cumsum over the K axis remain.

    Args:
        acc: (H, W, 4) carry composite.
        cnt: (H, W) int32 carry count (or None).
        shaded: (K, H, W, 4) premultiplied step colors.
        eligible: (K, H, W) bool — in-range (and any extra gates such as the
            nondiff alpha-skip or shard ownership), EXCLUDING the ERT gate.
    Returns: (acc, cnt, gate) updated.
    """
    T_carry = 1.0 - acc[..., 3:4]                                # (H, W, 1)
    a_in = jnp.where(eligible, shaded[..., 3], 0.0)              # (K, H, W)
    if ert:
        T_prev = _exclusive_cumprod(1.0 - a_in, axis=0)          # (K, H, W)
        gate = eligible & (T_carry[..., 0][None] * T_prev
                           > 1.0 - config.ert_threshold)
        a_g = jnp.where(gate, shaded[..., 3], 0.0)
        Tg_prev = _exclusive_cumprod(1.0 - a_g, axis=0)
    else:
        gate = eligible
        a_g = a_in
        Tg_prev = _exclusive_cumprod(1.0 - a_g, axis=0)

    rgb_contrib = jnp.sum(
        Tg_prev[..., None] * jnp.where(gate[..., None], shaded[..., :3], 0.0),
        axis=0)                                                  # (H, W, 3)
    new_rgb = acc[..., :3] + T_carry * rgb_contrib
    T_new = T_carry[..., 0] * jnp.prod(1.0 - a_g, axis=0)        # (H, W)
    acc = jnp.concatenate([new_rgb, (1.0 - T_new)[..., None]], axis=-1)
    if cnt is not None:
        cnt = cnt + jnp.sum(gate.astype(jnp.int32), axis=0)
    return acc, cnt, gate


class _RaySoA(NamedTuple):
    """Flattened (N = H*W) structure-of-arrays ray state for the hot march.

    The AoS ``RayBundle`` carries (H, W, 3) direction tensors; the march
    instead threads per-component (N,) arrays so every hot tensor has a
    clean TPU layout (see the SoA section of :mod:`differender_tpu.sampling`).
    """

    dx: Array
    dy: Array
    dz: Array
    t0: Array
    dt: Array
    n_samples: Array


def _ray_soa(rays: RayBundle, params: MarchParams) -> _RaySoA:
    n = rays.dirs.shape[0] * rays.dirs.shape[1]
    return _RaySoA(
        dx=rays.dirs[..., 0].reshape(n),
        dy=rays.dirs[..., 1].reshape(n),
        dz=rays.dirs[..., 2].reshape(n),
        t0=params.t0.reshape(n),
        dt=params.dt.reshape(n),
        n_samples=rays.n_samples.reshape(n),
    )


def _prep_volume(volume: Array, config: RenderConfig):
    """March-ready volume operand per ``config.resolved_march_table()``:
    the (X*Y*Z, 64) supercell table (default where it fits — 64-wide rows
    gather at ~10.5 ns/idx vs 14.8 for 8-wide cell rows on this stack, and
    one row serves the whole parity stencil / a group of consecutive
    steps), the (X*Y*Z, 8) cell table, or the flat volume (8x/64x less
    memory, more gather indices)."""
    kind = config.resolved_march_table()
    if kind == "super64":
        if (not config.analytic_normals
                and 2.0 * config.normal_delta
                * (max(config.volume_shape) - 1.0) >= 1.0):
            raise ValueError(
                "march_table='super64' parity sampling requires the stencil "
                "to fit one 4x4x4 row: 2*normal_delta*(size-1) < 1 voxel "
                f"(got delta={config.normal_delta}, "
                f"shape={config.volume_shape}); use cell8/flat or "
                "analytic_normals")
        return kind, supercell_table(volume)
    if kind == "super64s2":
        from .sampling import supercell2_table
        if config.analytic_normals:
            raise ValueError(
                "march_table='super64s2' is a parity-mode table (analytic "
                "mode gets no stencil sharing from it; use super64/cell8)")
        if (config.normal_delta * (max(config.volume_shape) - 1.0) >= 1.0
                or any(s % 2 for s in config.volume_shape)):
            raise ValueError(
                "march_table='super64s2' requires even volume dims and "
                "normal_delta*(size-1) < 1 voxel (stencil span + 2-voxel "
                f"even-base slack must fit the 4x4x4 row); got "
                f"delta={config.normal_delta}, shape={config.volume_shape}")
        return kind, supercell2_table(volume)
    if kind == "cell8":
        return kind, cell_table(volume)
    return "flat", volume.reshape(-1)


def _prep_tf(tf: Array, config: RenderConfig):
    """March-ready TF operand: the raw (R, 4) texture for the gather-free
    MXU-dot lookup (R <= 1024 — cost is O(R) VPU weight-build per sample),
    else the (R*8,) low/high gather table."""
    return tf if tf.shape[0] <= 1024 else tf_table8(tf)


def _block_positions(origin, soa: "_RaySoA", steps):
    """March positions of a step block, (K, N) per component.  The ONE
    place this formula lives: the forward march and the split backward's
    placement program must recompute bitwise-identical positions."""
    steps2 = steps if steps.ndim == 2 else steps[:, None]
    t = soa.t0[None] + steps2.astype(jnp.float32) * soa.dt[None]
    px = origin[0] + t * soa.dx[None]
    py = origin[1] + t * soa.dy[None]
    pz = origin[2] + t * soa.dz[None]
    return px, py, pz


def _block_sample_spec(config: RenderConfig, kind: str, super_group: int,
                       sorted_mode: bool, n_tiles: int = 1):
    """SampleSpec for the hand-VJP samplers — shared between
    :func:`_eval_block_soa` and the blockwise placement program so both
    halves of the split backward agree on grouping/windowing exactly."""
    from .sampling import SampleSpec
    return SampleSpec(volume_shape=tuple(config.volume_shape),
                      delta=float(config.normal_delta),
                      group=(super_group
                             if (sorted_mode or config.analytic_normals)
                             else 1),
                      parity=not config.analytic_normals,
                      n_tiles=n_tiles, box=config.vjp_box,
                      check=config.vjp_check,
                      box_rows=config.vjp_box_rows,
                      window_rows=config.vjp_window_rows,
                      stride2=kind == "super64s2",
                      camera_grads=config.camera_grads and sorted_mode)


def _eval_block_soa(vol_op, tf_op, origin, soa: _RaySoA, steps, sampling_rate,
                    config: RenderConfig, clamp_light: bool,
                    super_group: int = 1, tiled_volume=None,
                    n_tiles: int = 1, vjp_mode: str = "tiled"):
    """Evaluate K march steps, SoA.  Gather budget per block (the dominant
    cost on this stack is per-INDEX with strong table-size/row-width
    effects, see experiments/row_scatter_results.jsonl): with the default
    supercell table, ONE 64-wide row gather per ``super_group`` samples
    (analytic mode) or per sample incl. the full 7-point parity stencil;
    ZERO gathers for the TF (MXU-dot lookup) at R <= 1024.

    ``vol_op``/``tf_op`` come from :func:`_prep_volume`/:func:`_prep_tf`.
    Returns premultiplied channels (pr, pg, pb, alpha), the raw TF alpha,
    and the in-range mask — all (K, N).
    """
    kind, vol_op = vol_op
    steps2 = steps if steps.ndim == 2 else steps[:, None]   # (K, N) or (K, 1)
    px, py, pz = _block_positions(origin, soa, steps2)      # (K, N)
    if kind in ("super64", "super64s2") and tiled_volume is not None:
        from .sampling import (sample_block_defer, sample_block_sorted,
                               sample_block_sorted2, sample_block_tiled)
        # The tiled parity forward is ungrouped (group 1); sorted is
        # grouped in both modes, exactly like the AD path.
        sorted_mode = vjp_mode in ("sorted", "defer")
        if vjp_mode == "defer":
            # tiled_volume is the cotangent MAILBOX (see
            # sampling.sample_block_defer) — placement runs in the
            # caller's separate program via sorted_place_cot.
            hand_fn = sample_block_defer
        elif kind == "super64s2":
            hand_fn = sample_block_sorted2      # march_diff validates mode
        else:
            hand_fn = (sample_block_sorted if sorted_mode
                       else sample_block_tiled)
        spec = _block_sample_spec(config, kind, super_group, sorted_mode,
                                  n_tiles)
        _hand_fn = functools.partial(hand_fn, spec, tiled_volume)

        def sample(tbl, _shape, px_, py_, pz_, _delta):
            return _hand_fn(tbl, px_, py_, pz_)
    elif kind == "super64":
        if config.analytic_normals:
            sample = functools.partial(sample_super_analytic,
                                       group=super_group)
        else:
            sample = functools.partial(sample_super_parity,
                                       group=super_group)
    elif kind == "super64s2":
        from .sampling import sample_super2_parity
        sample = functools.partial(sample_super2_parity, group=super_group)
    elif kind == "cell8":
        sample = (sample_cell_analytic if config.analytic_normals
                  else sample_cell_parity)
    else:
        sample = (sample_soa_analytic if config.analytic_normals
                  else sample_soa_parity)
    intensity, (gx, gy, gz) = sample(vol_op, config.volume_shape,
                                     px, py, pz, config.normal_delta)
    # Checkpoint-name tags: march_diff's remat policy saves exactly these
    # five (K, N) residuals per block, so the backward pass recomputes the
    # cheap elementwise chain but NEVER re-issues the cell-row gather (the
    # march is linear in the gathered values, so d_vals needs only weights
    # and cotangents; XLA dead-code-eliminates the forward gather from the
    # backward unless camera gradients are requested).
    from jax.ad_checkpoint import checkpoint_name as name
    intensity = name(intensity, "march_intensity")
    gx = name(gx, "march_gx")
    gy = name(gy, "march_gy")
    gz = name(gz, "march_gz")
    if tf_op.ndim == 2:
        r, g, b, a = apply_tf_dot_soa(tf_op, intensity)
    else:
        r, g, b, a = apply_tf_soa(tf_op, intensity)
    pr, pg, pb, alpha = shade_soa(
        px, py, pz, gx, gy, gz, r, g, b, a,
        soa.dx[None], soa.dy[None], soa.dz[None],
        origin, sampling_rate, config, clamp_light=clamp_light)
    alpha = name(alpha, "march_alpha")
    in_range = ((steps2 < soa.n_samples[None])
                & (steps2 < config.max_samples))
    return pr, pg, pb, alpha, a, in_range


def composite_block_soa(accs, cnt, pr, pg, pb, pa, eligible,
                        config: RenderConfig, ert: bool = True):
    """SoA :func:`composite_block`: same closed-form prefix-gated composite,
    channels threaded as separate (N,) arrays.

    Args:
        accs: (acc_r, acc_g, acc_b, acc_a) each (N,).
        cnt: (N,) int32 or None.
        pr/pg/pb/pa: (K, N) premultiplied step colors + opacity.
        eligible: (K, N) bool, excluding the ERT gate.
    """
    acc_r, acc_g, acc_b, acc_a = accs
    T_carry = 1.0 - acc_a                                   # (N,)
    a_in = jnp.where(eligible, pa, 0.0)                     # (K, N)
    if ert:
        T_prev = _exclusive_cumprod(1.0 - a_in, axis=0)
        gate = eligible & (T_carry[None] * T_prev
                           > 1.0 - config.ert_threshold)
        a_g = jnp.where(gate, pa, 0.0)
        Tg_prev = _exclusive_cumprod(1.0 - a_g, axis=0)
    else:
        gate = eligible
        a_g = a_in
        Tg_prev = _exclusive_cumprod(1.0 - a_g, axis=0)

    acc_r = acc_r + T_carry * jnp.sum(
        Tg_prev * jnp.where(gate, pr, 0.0), axis=0)
    acc_g = acc_g + T_carry * jnp.sum(
        Tg_prev * jnp.where(gate, pg, 0.0), axis=0)
    acc_b = acc_b + T_carry * jnp.sum(
        Tg_prev * jnp.where(gate, pb, 0.0), axis=0)
    T_new = T_carry * jnp.prod(1.0 - a_g, axis=0)
    acc_a = 1.0 - T_new
    if cnt is not None:
        cnt = cnt + jnp.sum(gate.astype(jnp.int32), axis=0)
    return (acc_r, acc_g, acc_b, acc_a), cnt, gate


def _safe_supercell_group(config: RenderConfig, sampling_rate,
                          block: int) -> int:
    """Supercell step-group size that is valid for the *traced* rate.

    ``supercell_group`` sizes how many consecutive march steps may share one
    4x4x4 row — a function of the step length, i.e. of the TRACED
    ``sampling_rate``.  Deriving it from ``static_sampling_rate`` (which may
    legitimately exceed the traced rate — it only sizes the scan bound)
    would under-estimate the step span and silently read hat weights outside
    the gathered row (advisor round-2 finding).  When the traced rate is a
    concrete python number we use it directly; when it is a tracer there is
    no guaranteed lower bound, so fall back to group=1 (always valid).
    """
    if isinstance(sampling_rate, (int, float)):
        grp = config.supercell_group(float(sampling_rate))
    else:
        grp = 1
    while block % grp:
        grp //= 2
    return grp


def march_diff(
    volume: Array,
    tf: Array,
    rays: RayBundle,
    config: RenderConfig,
    sampling_rate,
    static_sampling_rate: float,
    ert: bool = True,
):
    """Differentiable march (reference ``raycast``, `:261-306`).

    Internally SoA (see :func:`_eval_block_soa`): 2 gather HLOs per block
    instead of the AoS path's one-per-callsite, and no trailing-3/4 tensors.

    Args:
        sampling_rate: traced float used in the math (opacity correction and
            step length).  Pass a concrete python number to enable supercell
            step grouping under march_table='super64' — with a tracer the
            group conservatively degrades to 1 (see
            :func:`_safe_supercell_group`).
        static_sampling_rate: python float used only to size the static scan
            bound; must be >= the traced value so the bound covers every
            in-range sample.
        ert: disable to march every in-range sample (used for cross-checking
            the sharded renderer, where early termination is not causal
            across volume shards).
    Returns:
        (acc (H,W,4), valid_steps (H,W) int32)
    """
    params = march_params(rays)
    H, W = config.image_shape
    N = H * W
    n_steps = config.diff_march_steps(static_sampling_rate)
    block = max(1, min(config.block_size, n_steps))
    n_blocks = -(-n_steps // block)

    sr = jnp.asarray(sampling_rate, jnp.float32)
    kind = config.resolved_march_table()
    tiled = config.march_vjp == "tiled"
    sorted_vjp = config.march_vjp == "sorted"
    if tiled and (kind != "super64" or H % config.vjp_tile
                  or W % config.vjp_tile):
        raise ValueError(
            "march_vjp='tiled' requires march_table super64 and image dims "
            f"divisible by vjp_tile={config.vjp_tile}; got table={kind}, "
            f"image={config.image_shape}")
    if sorted_vjp and kind not in ("super64", "super64s2"):
        raise ValueError(
            "march_vjp='sorted' requires march_table super64 or "
            f"super64s2; got {kind}")
    if config.camera_grads and tiled:
        # The tiled hand-VJP returns ZERO sample-position cotangents, so a
        # jax.grad w.r.t. look_from through it is silently wrong (the
        # reference has no camera grads at all).  Fail loudly instead of
        # dropping terms.  Round 5: the SORTED VJPs now produce exact
        # position cotangents when camera_grads=True
        # (sampling._position_cotangents), so only 'tiled' refuses.
        raise ValueError(
            "camera_grads=True requires march_vjp='ad' or 'sorted' (the "
            "'tiled' hand-VJP drops the sample-position cotangent terms); "
            f"got march_vjp={config.march_vjp!r}")
    if config.compact_after and tiled:
        raise ValueError(
            "compact_after is incompatible with march_vjp='tiled' (the "
            "tiled VJP requires tile-contiguous lane order; compaction "
            "permutes lanes)")

    if tiled:
        # Tile-major pixel order: the hand-written VJP scatters volume
        # gradients per image tile (see sampling.sample_block_tiled), so
        # each tile's rays must be contiguous in the flat N axis.
        te = config.vjp_tile
        n_tiles = (H // te) * (W // te)

        def _fwdord(a2d):
            return a2d.reshape(H // te, te, W // te, te).transpose(
                0, 2, 1, 3).reshape(N)

        def _invord(a1d):
            return a1d.reshape(H // te, W // te, te, te).transpose(
                0, 2, 1, 3).reshape(H, W)

        soa = _RaySoA(
            dx=_fwdord(rays.dirs[..., 0]), dy=_fwdord(rays.dirs[..., 1]),
            dz=_fwdord(rays.dirs[..., 2]), t0=_fwdord(params.t0),
            dt=_fwdord(params.dt), n_samples=_fwdord(rays.n_samples))
    else:
        n_tiles = 1
        _invord = None
        soa = _ray_soa(rays, params)

    kind_op, vol_op = _prep_volume(volume, config)
    if tiled or sorted_vjp:
        # All volume gradients come from the custom VJP; sever the AD path
        # through the table construction.
        vol_op = jax.lax.stop_gradient(vol_op)
    tf_op = _prep_tf(tf, config)

    grp = _safe_supercell_group(config, sampling_rate, block)

    def _mk_block_fn(soa_x):
        """The remat'd, ERT-skip-wrapped march-block body over an arbitrary
        ray SoA (the compaction path below marches the same body on an
        alive-compacted prefix SoA)."""
        def eval_block(carry, s0):
            accs, cnt = carry
            steps = s0 + jnp.arange(block, dtype=jnp.int32)
            pr, pg, pb, pa, _, in_range = _eval_block_soa(
                (kind_op, vol_op), tf_op, rays.origin, soa_x, steps, sr,
                config, clamp_light=True, super_group=grp,
                tiled_volume=volume if (tiled or sorted_vjp) else None,
                n_tiles=n_tiles, vjp_mode=config.march_vjp)
            accs, cnt, _ = composite_block_soa(accs, cnt, pr, pg, pb, pa,
                                               in_range, config, ert=ert)
            return (accs, cnt), None

        # Remat with named residuals: O(5*K*N) saved per block (the tagged
        # intensity/gradient/alpha), everything else recomputed — crucially
        # the cell-row gather is NOT re-issued in the backward (see
        # _eval_block_soa).  The checkpoint sits INSIDE the ERT conditional
        # below: wrapping the cond from outside defeats the named-residual
        # policy (everything in the taken branch gets saved — 22 GB at the
        # headline config).
        eval_block = jax.checkpoint(
            eval_block,
            policy=jax.checkpoint_policies.save_only_these_names(
                "march_intensity", "march_gx", "march_gy", "march_gz",
                "march_alpha"),
            prevent_cse=False)

        if ert and config.ert_block_skip:
            # Block-level early-ray termination: once every ray is either
            # ERT-gated (acc alpha >= threshold) or past its sample count,
            # the remaining blocks are EXACT no-ops (the composite gate is
            # prefix-closed), so skip them with a runtime conditional — the
            # differentiable-path analogue of the reference's per-thread
            # copy-forward branch (`:267-269,304-306`) and of
            # march_nondiff's while_loop.  Measured: 2.07x forward, 1.83x
            # fwd+bwd at the headline config.  Under vmap the cond lowers
            # to a select (both branches run) — correct, just without the
            # savings.  ert_block_skip=False restores the plain scan (the
            # cond adds a few hundred MB to the backward's peak memory —
            # parity mode at the headline config sits exactly at the HBM
            # edge).
            def block_fn(carry, s0):
                accs, cnt = carry
                alive = jnp.any((accs[3] < config.ert_threshold)
                                & (soa_x.n_samples > s0))
                return jax.lax.cond(alive, eval_block,
                                    lambda c, _s: (c, None), carry, s0)
            return block_fn
        return eval_block

    block_fn = _mk_block_fn(soa)
    zero = jnp.zeros((N,), jnp.float32)
    accs0 = (zero, zero, zero, zero)
    cnt0 = jnp.ones((N,), jnp.int32)   # init 1, see `clear_framebuffer` `:381`
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * block
    compact = (ert and not tiled and 0 < config.compact_after < n_blocks)
    if not compact:
        (accs, cnt), _ = jax.lax.scan(block_fn, (accs0, cnt0), starts)
    else:
        # Alive-ray compaction (config.compact_after): ERT terminates most
        # rays early (measured 16% effective/nominal samples at the
        # headline noise scene) but the global block skip keeps every lane
        # marching — and the sorted VJP's per-block (M, 64) cotangent
        # sort+take (17.6 ns/row, the largest single backward cost) pays
        # for every lane too.  After `compact_after` blocks, permute rays
        # alive-first (ONE packed (N, 16) take — gather op count per
        # CLAUDE.md rules 3/5) and march the remaining blocks as a scan
        # over N/P ray TILES with a per-tile skip: alive rays occupy a
        # sorted prefix, so only ceil(n_alive/P) tiles march and the rest
        # skip — exact for EVERY alive count with a single tail body (an
        # earlier cond-with-full-width-fallback form carried two tail
        # bodies and crashed the remote compile helper at the headline
        # config).  Exactness: the alive predicate is the march's own
        # prefix-closed gate — a dead ray's remaining blocks contribute
        # exactly nothing — and all per-ray math is lane-order invariant
        # (d_volume changes only by scatter-order reassociation ulps).
        ca = config.compact_after
        (accs, cnt), _ = jax.lax.scan(block_fn, (accs0, cnt0),
                                      starts[:ca])
        s_split = jnp.int32(ca * block)
        alive = (accs[3] < config.ert_threshold) & (soa.n_samples > s_split)
        order = jnp.argsort(jnp.logical_not(
            jax.lax.stop_gradient(alive))).astype(jnp.int32)
        pack = jnp.stack([
            soa.dx, soa.dy, soa.dz, soa.t0, soa.dt,
            soa.n_samples.astype(jnp.float32),          # <= max_samples:
            accs[0], accs[1], accs[2], accs[3],         # exact in f32
            cnt.astype(jnp.float32),
            jax.lax.stop_gradient(alive).astype(jnp.float32),
            zero, zero, zero, zero], axis=1)            # pad to (N, 16)
        pk = jnp.take(pack, order, axis=0)
        n_tiles_c = max(1, int(round(1.0 / config.compact_prefix)))
        while N % n_tiles_c:
            n_tiles_c -= 1
        P = N // n_tiles_c
        tail_starts = starts[ca:]
        soa_cols = pk[:, 0:6]
        accs_p = (pk[:, 6], pk[:, 7], pk[:, 8], pk[:, 9])
        cnt_p = pk[:, 10].astype(jnp.int32)
        alive_p = pk[:, 11]

        def tile_body(carry, k):
            accs_t, cnt_t = carry
            off = k * jnp.int32(P)
            sl = jax.lax.dynamic_slice_in_dim(soa_cols, off, P, axis=0)
            soa_k = _RaySoA(dx=sl[:, 0], dy=sl[:, 1], dz=sl[:, 2],
                            t0=sl[:, 3], dt=sl[:, 4],
                            n_samples=sl[:, 5].astype(jnp.int32))
            a_k = tuple(jax.lax.dynamic_slice_in_dim(x, off, P)
                        for x in accs_t)
            c_k = jax.lax.dynamic_slice_in_dim(cnt_t, off, P)

            def run(args):
                a0, c0 = args
                fn = _mk_block_fn(soa_k)
                (a1, c1), _ = jax.lax.scan(fn, (a0, c0), tail_starts)
                return a1, c1

            any_alive = jnp.any(
                jax.lax.dynamic_slice_in_dim(alive_p, off, P) > 0.0)
            a_k, c_k = jax.lax.cond(any_alive, run, lambda args: args,
                                    (a_k, c_k))
            accs_t = tuple(
                jax.lax.dynamic_update_slice_in_dim(x, xk, off, 0)
                for x, xk in zip(accs_t, a_k))
            cnt_t = jax.lax.dynamic_update_slice_in_dim(cnt_t, c_k, off, 0)
            return (accs_t, cnt_t), None

        (accs_p, cnt_p), _ = jax.lax.scan(
            tile_body, (accs_p, cnt_p),
            jnp.arange(n_tiles_c, dtype=jnp.int32))
        out_pack = jnp.stack([accs_p[0], accs_p[1], accs_p[2], accs_p[3],
                              cnt_p.astype(jnp.float32),
                              zero, zero, zero], axis=1)    # (N, 8)
        unsorted = jnp.zeros((N, 8), jnp.float32).at[order].set(out_pack)
        accs = tuple(unsorted[:, i] for i in range(4))
        cnt = unsorted[:, 4].astype(jnp.int32)
    if tiled:
        acc = jnp.stack([_invord(a) for a in accs], axis=-1)
        return acc, _invord(cnt)
    acc = jnp.stack(accs, axis=-1).reshape(H, W, 4)
    return acc, cnt.reshape(H, W)


def march_nondiff(
    volume: Array,
    tf: Array,
    rays: RayBundle,
    config: RenderConfig,
    sampling_rate,
    static_sampling_rate: float,
    occupancy=None,
):
    """Fast inference march (reference ``raycast_nondiff``, `:308-351`).

    Differences vs the diff path, all mirroring the reference: in-place
    composite (no tape), NO ``max_samples`` cap, empty-space skip for TF
    alpha <= ``alpha_skip`` (`:334`), no ``min(1, light)`` clamp (`:344-347`),
    and a final elementwise ``min(1, rgba)``
    (``get_final_image_nondiff``, `:358`).

    TPU additions (both semantics-preserving):
      * the march runs as a ``while_loop`` over step blocks that stops as
        soon as every ray has either terminated (alpha >= 0.99) or
        exhausted its samples — the SIMD analogue of per-thread early exit;
      * with ``occupancy`` (an :class:`differender_tpu.occupancy.
        OccupancyGrid` built for this volume+TF), each ray additionally
        JUMPS over runs of samples that are provably below the alpha-skip
        threshold — the empty-space data structure the reference lacks,
        and the fix for its flagship sampling_rate=16 workload being
        gather-bound (see the occupancy module docstring).  Skipped
        samples contribute exactly nothing in the reference semantics, so
        the image is unchanged.
    """
    params = march_params(rays)
    H, W = config.image_shape
    N = H * W
    n_steps = config.max_steps_for(static_sampling_rate)
    block = max(1, min(config.block_size, n_steps))
    n_blocks = -(-n_steps // block)

    sr = jnp.asarray(sampling_rate, jnp.float32)
    soa = _ray_soa(rays, params)
    vol_op = _prep_volume(volume, config)
    tf_op = _prep_tf(tf, config)
    grp = _safe_supercell_group(config, sampling_rate, block)
    arange_k = jnp.arange(block, dtype=jnp.int32)

    def _nd_jump(s_r, soa_p):
        from .occupancy import jump_steps
        t = soa_p.t0 + s_r.astype(jnp.float32) * soa_p.dt
        px = rays.origin[0] + t * soa_p.dx
        py = rays.origin[1] + t * soa_p.dy
        pz = rays.origin[2] + t * soa_p.dz
        adv = jump_steps(occupancy, config.volume_shape, px, py, pz,
                         soa_p.dt)
        # Keep the march BLOCK-ALIGNED so skipping is bitwise invisible:
        # (a) grouped sampling picks each row base from the group-min
        # position, so shifting which steps share a group perturbs the
        # f32 hat weights; (b) the composite accumulates one partial sum
        # per block, so shifting block boundaries reassociates the sums
        # (~1 ulp each).  Rounding the advance down to a block multiple
        # (block % grp == 0) makes every visited block identical to the
        # no-skip march's — images match bit for bit (tests/
        # test_occupancy.py) at a cost of < one block of skipped steps
        # per jump.
        adv = (adv // block) * block
        # Jumps stay within the ray (termination math must see the true
        # head); the alive gate handles exhausted rays either way.
        return s_r + jnp.minimum(adv, jnp.maximum(soa_p.n_samples - s_r, 0))

    def _nd_body(state, soa_p):
        accs, s_r, it = state
        if occupancy is not None and config.occupancy_jump_every > 1:
            s_r = jax.lax.cond(it % config.occupancy_jump_every == 0,
                               lambda s: _nd_jump(s, soa_p),
                               lambda s: s, s_r)
        elif occupancy is not None:
            s_r = _nd_jump(s_r, soa_p)
        steps = s_r[None, :] + arange_k[:, None]               # (K, M)
        pr, pg, pb, pa, tf_alpha, _ = _eval_block_soa(
            vol_op, tf_op, rays.origin, soa_p, steps, sr, config,
            clamp_light=False, super_group=grp)
        # NOTE: the nondiff kernel has no max_samples cap (`:316`), so use
        # the pure n_samples gate rather than _eval_block_soa's in_range.
        in_range = steps < soa_p.n_samples[None]
        eligible = in_range & (tf_alpha > config.alpha_skip)   # `:334`
        accs, _, _ = composite_block_soa(accs, None, pr, pg, pb, pa,
                                         eligible, config, ert=True)
        return accs, s_r + block, it + 1

    def _alive(accs, s_r, n_samples):
        return (accs[3] < config.ert_threshold) & (s_r < n_samples)

    zero = jnp.zeros((N,), jnp.float32)
    init = ((zero, zero, zero, zero), jnp.zeros((N,), jnp.int32),
            jnp.int32(0))

    if not config.nondiff_compaction:
        def cond_fn(state):
            accs, s_r, it = state
            return ((it < n_blocks)
                    & jnp.any(_alive(accs, s_r, soa.n_samples)))

        accs, _, _ = jax.lax.while_loop(
            cond_fn, lambda st: _nd_body(st, soa), init)
        acc = jnp.stack(accs, axis=-1).reshape(H, W, 4)
        return jnp.minimum(1.0, acc)

    # Wavefront compaction: per-iteration cost is O(active lanes), but most
    # rays terminate (ERT / sample exhaustion / empty space) long before
    # the deepest ray — at the reference's sr=16 workload the march runs
    # ~750 block iterations while the median ray needs a few dozen, and
    # the measured wall time is iteration cost x iterations regardless of
    # how many lanes still do useful work.  Run a STATIC phase ladder
    # N -> N/4 -> N/16 ...: each phase marches only a compacted prefix of
    # still-alive rays (argsort alive-first + gather) and stops as soon as
    # the alive count fits the next phase.  Each ray executes exactly the
    # same sample sequence — images match the plain loop to XLA fusion/
    # reassociation noise (~1 ulp; the programs fuse differently).
    phases = [N]
    while phases[-1] > config.compaction_min and len(phases) < 5:
        phases.append(phases[-1] // 4)
    stops = phases[1:] + [0]

    def make_phase(stop):
        def cond_p(state):
            (accs, s_r, it), soa_p = state
            return ((it < n_blocks)
                    & (jnp.sum(_alive(accs, s_r, soa_p.n_samples)) > stop))

        def body_p(state):
            core, soa_p = state
            return _nd_body(core, soa_p), soa_p

        return cond_p, body_p

    accs, s_r, it = init
    perm = jnp.arange(N, dtype=jnp.int32)
    for M, stop in zip(phases, stops):
        idx = perm[:M]
        soa_p = _RaySoA(*(jnp.take(a, idx) for a in soa))
        accs_p = tuple(jnp.take(a, idx) for a in accs)
        s_r_p = jnp.take(s_r, idx)
        cond_p, body_p = make_phase(stop)
        ((accs_p, s_r_p, it), _) = jax.lax.while_loop(
            cond_p, body_p, ((accs_p, s_r_p, it), soa_p))
        accs = tuple(a.at[idx].set(ap) for a, ap in zip(accs, accs_p))
        s_r = s_r.at[idx].set(s_r_p)
        if M != phases[-1]:
            alive = _alive(accs, s_r, soa.n_samples)
            perm = jnp.argsort(~alive, stable=True).astype(jnp.int32)
    acc = jnp.stack(accs, axis=-1).reshape(H, W, 4)
    return jnp.minimum(1.0, acc)


# ---------------------------------------------------------------------------
# Public functional API
# ---------------------------------------------------------------------------

def render(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    ert: bool = True,
) -> RenderOutput:
    """Differentiable render — the functional equivalent of one item of
    ``RaycastFunction.forward`` (`/root/reference/differender/volume_raycaster.py:419-426`).

    Args:
        volume: (X, Y, Z) f32 scalar volume (internal axis order; use
            :class:`differender_tpu.raycaster.Raycaster` for the torch-style
            ``(1, D, H, W)`` convention).
        tf: (R, 4) RGBA transfer function texture.
        look_from: (3,) camera position; the camera looks at the origin.
        config: static :class:`RenderConfig`.
        sampling_rate: Nyquist multiplier; defaults to ``config.sampling_rate``.
            Treated as a static python float (sizes the march bound).
        key: optional PRNG key enabling ray-start jitter (`:254-255`).  The
            same key in forward and VJP makes jittered gradients exact —
            fixing the reference's stochastic backward replay (SURVEY §2.6).
        ert: early-ray termination (on by default, as in the reference).

    Gradients flow to ``volume`` and ``tf`` (and, unlike the reference, also
    to ``look_from`` if you ask jax.grad for it — camera gradients come free
    with functional AD).
    """
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    rays = make_rays(look_from, config, sr, jitter_key=key)
    acc, cnt = march_diff(volume, tf, rays, config, sr, float(sr), ert=ert)
    return RenderOutput(image=acc, valid_steps=cnt, n_samples=rays.n_samples)


def render_nondiff(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    occupancy=None,
) -> RenderOutput:
    """Fast inference render — one item of ``Raycaster.raycast_nondiff``
    (`/root/reference/differender/volume_raycaster.py:502-511`).  Default
    sampling rate is ``4 * config.sampling_rate`` (`:493`); jitter is off
    unless a key is passed (the reference forces it off, `:508`).

    With ``config.occupancy_skip`` (default), empty space is skipped via a
    macrocell distance field — image unchanged, large speedups at high
    sampling rates (see :mod:`differender_tpu.occupancy`).  Pass a prebuilt
    ``occupancy`` grid to amortize the build over many views of one
    volume+TF pair."""
    sr = 4.0 * config.sampling_rate if sampling_rate is None else sampling_rate
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    if occupancy is None and config.occupancy_skip:
        from .occupancy import build_occupancy
        occupancy = build_occupancy(volume, tf, config)
    rays = make_rays(look_from, config, sr, jitter_key=key)
    img = march_nondiff(volume, tf, rays, config, sr, float(sr),
                        occupancy=occupancy)
    # raycast_nondiff never updates valid_sample_step_count (`:315-351`).
    cnt = jnp.ones(config.image_shape, jnp.int32)
    return RenderOutput(image=img, valid_steps=cnt, n_samples=rays.n_samples)


def render_nondiff_strips(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    n_strips: int = 4,
    occupancy=None,
) -> RenderOutput:
    """:func:`render_nondiff` executed as ``n_strips`` independent
    row-strip programs.

    The reference's flagship inference workload (800x800 at sampling_rate
    16, `/root/reference/examples/render_nondiff.py:20,27`) produces a
    single program large enough to crash this stack's TPU worker
    (BASELINE.md round 2); strip-wise execution bounds program size while
    keeping results identical (rays are independent).  The occupancy grid
    and ray setup are computed once and shared."""
    sr = 4.0 * config.sampling_rate if sampling_rate is None else sampling_rate
    H, W = config.image_shape
    if H % n_strips:
        raise ValueError(
            f"n_strips={n_strips} must divide the image height {H}")
    h = H // n_strips
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    if occupancy is None and config.occupancy_skip:
        from .occupancy import build_occupancy
        occupancy = jax.jit(
            build_occupancy, static_argnames=("config",)
        )(volume, tf, config)
    rays = make_rays(look_from, config, sr, jitter_key=key)
    strip_cfg = config.replace(image_shape=(h, W))
    imgs = []
    for s in range(n_strips):
        sl = slice(s * h, (s + 1) * h)
        rb = RayBundle(origin=rays.origin, dirs=rays.dirs[sl],
                       entry=rays.entry[sl], exit=rays.exit[sl],
                       n_samples=rays.n_samples[sl])
        imgs.append(_march_nondiff_strip(volume, tf, rb, strip_cfg,
                                         float(sr), occupancy))
    img = jnp.concatenate(imgs, axis=0)
    cnt = jnp.ones(config.image_shape, jnp.int32)
    return RenderOutput(image=img, valid_steps=cnt, n_samples=rays.n_samples)


@functools.partial(jax.jit, static_argnames=("config", "sampling_rate"))
def _march_nondiff_strip(volume, tf, rays: RayBundle, config: RenderConfig,
                         sampling_rate: float, occupancy):
    return march_nondiff(volume, tf, rays, config, sampling_rate,
                         sampling_rate, occupancy=occupancy)


def render_strips(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    n_strips: int = 4,
    ert: bool = True,
) -> RenderOutput:
    """:func:`render` (differentiable) executed as ``n_strips`` independent
    row-strip programs — identical results, bounded per-program size.

    At large scales a monolithic march program can exceed this stack's
    remote-compiler limits (measured: the 512^3 -> 1024^2 parity backward
    crashes it; BASELINE.md round 3).  Rays are independent, so slicing
    the image into row strips and marching each in its own jitted call is
    exact, and ``jax.grad`` through this function compiles per-strip
    forward/backward programs with gradient accumulation across strips.

    Do NOT wrap this in an outer ``jax.jit`` — that would inline all
    strips back into one program and forfeit the size bound.
    """
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    H, W = config.image_shape
    if H % n_strips:
        raise ValueError(
            f"n_strips={n_strips} must divide the image height {H}")
    h = H // n_strips
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    rays = make_rays(look_from, config, sr, jitter_key=key)
    strip_cfg = config.replace(image_shape=(h, W))
    accs, cnts = [], []
    for s in range(n_strips):
        sl = slice(s * h, (s + 1) * h)
        rb = RayBundle(origin=rays.origin, dirs=rays.dirs[sl],
                       entry=rays.entry[sl], exit=rays.exit[sl],
                       n_samples=rays.n_samples[sl])
        acc, cnt = _march_diff_strip(volume, tf, rb, strip_cfg, float(sr),
                                     ert)
        accs.append(acc)
        cnts.append(cnt)
    return RenderOutput(image=jnp.concatenate(accs, axis=0),
                        valid_steps=jnp.concatenate(cnts, axis=0),
                        n_samples=rays.n_samples)


@functools.partial(jax.jit, static_argnames=("config", "sampling_rate",
                                             "ert"))
def _march_diff_strip(volume, tf, rays: RayBundle, config: RenderConfig,
                      sampling_rate: float, ert: bool):
    return march_diff(volume, tf, rays, config, sampling_rate,
                      sampling_rate, ert=ert)


def _predict_march_depth(volume, tf, rays: RayBundle, config: RenderConfig,
                         coarse: int = 32):
    """Cheap per-ray upper estimate of useful march depth, in samples.

    Samples the occupancy distance field (see
    :mod:`differender_tpu.occupancy`) at ``coarse`` points along each ray
    (ONE small-table gather) and maps the LAST occupied coarse interval to
    a sample index: past it every sample classifies below ``alpha_skip``.
    This is a SORT KEY for :func:`render_depth_sorted` — it may
    over-estimate (no ERT modeling) or slightly under-resolve (coarse
    grid), which only costs scheduling efficiency, never correctness.
    """
    from .occupancy import build_occupancy
    grid = build_occupancy(volume, tf, config)
    nx, ny, nz = grid.shape
    params = march_params(rays)
    H, W = config.image_shape
    N = H * W
    n_f = rays.n_samples.reshape(N).astype(jnp.float32)
    t0 = params.t0.reshape(N)
    dt = params.dt.reshape(N)
    frac = (jnp.arange(coarse, dtype=jnp.float32) + 0.5) / coarse  # (C,)
    t = t0[None] + frac[:, None] * (jnp.maximum(n_f - 1.0, 0.0)
                                    * dt)[None]                   # (C, N)
    dirs = rays.dirs.reshape(N, 3)

    def cell_of(p, size, n):
        v = jnp.clip(0.5 * p + 0.5, 0.0, 1.0) * np.float32(size - 1.0
                                                           - 1e-4)
        return jnp.clip((v / grid.cell).astype(jnp.int32), 0, n - 1)

    px = rays.origin[0] + t * dirs[:, 0][None]
    py = rays.origin[1] + t * dirs[:, 1][None]
    pz = rays.origin[2] + t * dirs[:, 2][None]
    ci = ((cell_of(px, config.volume_shape[0], nx) * ny
           + cell_of(py, config.volume_shape[1], ny)) * nz
          + cell_of(pz, config.volume_shape[2], nz))
    occ = jnp.take(grid.dist, ci.reshape(-1)).reshape(coarse, N) == 0
    # last occupied coarse interval (conservative: +1 interval of slack)
    idx = jnp.arange(1, coarse + 1, dtype=jnp.float32)[:, None]
    last = jnp.max(jnp.where(occ, idx, 0.0), axis=0)              # (C->N)
    return jnp.minimum((last + 1.0) / coarse, 1.0) * n_f          # samples


def render_depth_sorted(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    chunks: int = 4,
) -> RenderOutput:
    """:func:`render` with rays SORTED by predicted march depth into
    ``chunks`` equal groups, each marched by its own program.

    The diff march's ERT block skip is global: one deep ray keeps every
    lane marching (structured scenes pay this — the CT-phantom headline
    config runs 2x slower than the uniform-noise scene).  Grouping rays of
    similar predicted depth lets each chunk's skip fire at its own depth;
    background rays (nothing occupied along them) form a chunk that
    finishes almost immediately.  Exact: every ray marches its identical
    sample sequence (permutation + the existing prefix-closed skip);
    images/grads match :func:`render` to f32 fusion noise.

    WRAP THE WHOLE CALL (or the grad step over it) IN ONE ``jax.jit`` at
    headline-class scale: traced as one program, XLA sequences the
    chunks' buffers; the un-jitted host-level form enqueues every chunk
    program's fwd+bwd transients at once (buffers are allocated at
    ENQUEUE time on this runtime) and RESOURCE_EXHAUSTs at 256^3/512^2
    (measured: r11/r20 packed_ds4 error rows vs the jitted r14 form's
    2.07 s, experiments/r8_headline_results.jsonl).  Only fall back to
    the un-jitted form when the monolithic program exceeds the remote
    compile budget (1024^2-class images — the :func:`render_strips`
    regime).
    """
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    H, W = config.image_shape
    N = H * W
    if N % chunks:
        raise ValueError(f"chunks={chunks} must divide H*W={N}")
    M = N // chunks
    rays = make_rays(look_from, config, sr, jitter_key=key)
    # Sort key only — never differentiated (occupancy is int-thresholded
    # anyway; the stop keeps AD from even tracing the predictor).
    depth = jax.lax.stop_gradient(
        _predict_march_depth(volume, tf, rays, config))
    order = jnp.argsort(depth).astype(jnp.int32)                  # (N,)

    # ONE packed (N, 8) permute gather and ONE packed un-permute scatter:
    # every gather/scatter HLO costs ~55 ms flat on this stack regardless
    # of size, so the field-by-field form (4 takes in + an inverse-
    # permutation scatter + 2 takes out = 7 ops, ~0.4 s) was most of the
    # measured 0.6 s depth-sort overhead on the uniform-noise scene
    # (experiments/r8_headline_results.jsonl).  Minor dim 8 also avoids
    # the tiny-minor-dim tile padding (CLAUDE.md rule 3).
    pack = jnp.concatenate([
        rays.dirs.reshape(N, 3),
        rays.entry.reshape(N, 1),
        rays.exit.reshape(N, 1),
        rays.n_samples.reshape(N, 1).astype(jnp.float32),
        jnp.zeros((N, 2), jnp.float32),
    ], axis=1)
    pk = jnp.take(pack, order, axis=0)                            # (N, 8)
    chunk_cfg = config.replace(image_shape=(M, 1))
    outs = []
    for c in range(chunks):
        sl = slice(c * M, (c + 1) * M)
        rb = RayBundle(origin=rays.origin,
                       dirs=pk[sl, 0:3].reshape(M, 1, 3),
                       entry=pk[sl, 3].reshape(M, 1),
                       exit=pk[sl, 4].reshape(M, 1),
                       n_samples=pk[sl, 5].astype(jnp.int32).reshape(M, 1))
        acc, cnt = _march_diff_strip(volume, tf, rb, chunk_cfg, float(sr),
                                     True)
        outs.append(jnp.concatenate(
            [acc.reshape(M, 4), cnt.reshape(M, 1).astype(jnp.float32),
             jnp.zeros((M, 3), jnp.float32)], axis=1))
    out_pack = jnp.concatenate(outs, axis=0)                      # (N, 8)
    unsorted = jnp.zeros((N, 8), jnp.float32).at[order].set(out_pack)
    image = unsorted[:, 0:4].reshape(H, W, 4)
    valid = unsorted[:, 4].astype(jnp.int32).reshape(H, W)
    return RenderOutput(image=image, valid_steps=valid,
                        n_samples=rays.n_samples)


@functools.partial(jax.jit, static_argnames=("config", "sampling_rate"))
def _depth_spread(volume, tf, look_from, config: RenderConfig,
                  sampling_rate: float):
    """Fraction of rays whose predicted useful march depth is under half
    the deep-tail (p99) depth — the scene-structure statistic behind
    :func:`choose_diff_renderer`.  One small program: occupancy build +
    one coarse gather + reductions."""
    rays = make_rays(look_from, config, sampling_rate)
    d = _predict_march_depth(volume, tf, rays, config)
    # The statistic is RELATIVE to each ray's own march length: rho =
    # predicted useful depth / n_samples.  On a fully-occupied scene rho
    # == 1 for every hitting ray even though chord lengths (and hence
    # absolute n_samples) vary across the image — and measured at the
    # headline config, depth sorting LOSES on such scenes (noise 1.52 ->
    # 2.13 s) while winning on structured ones (phantom 2.47 -> 2.07 s,
    # experiments/r8_headline_results.jsonl).  Rays that MISS the AABB
    # (n_samples == 0, image corners) never extend the march and are
    # excluded.
    nf = rays.n_samples.reshape(-1).astype(jnp.float32)
    hit = nf > 0.0
    rho = d / jnp.maximum(nf, 1.0)
    n_hit = jnp.maximum(jnp.sum(hit.astype(jnp.float32)), 1.0)
    return jnp.sum(((rho < 0.5) & hit).astype(jnp.float32)) / n_hit


@functools.partial(jax.jit,
                   static_argnames=("config", "sampling_rate", "s_split"))
def _alive_fraction(volume, tf, look_from, config: RenderConfig,
                    sampling_rate: float, s_split: int):
    """Fraction of rays still marching after ``s_split`` steps, from one
    probe-resolution forward render.  ``valid_steps`` is (to within one
    gated step) each ray's termination depth: ERT-terminated rays stop
    counting at the saturation step, exhausted rays at their sample
    count — so ``valid_steps > s_split`` is the march's own alive
    predicate, estimated per ray."""
    out = render(volume, tf, look_from, config, sampling_rate)
    vs = out.valid_steps.reshape(-1)
    return jnp.mean((vs > s_split).astype(jnp.float32))


def choose_diff_renderer(volume, tf, look_from, config: RenderConfig,
                         sampling_rate: Optional[float] = None,
                         chunks: int = 4, threshold: float = 0.25,
                         alive_threshold: float = 0.125,
                         compact_after: int = 2,
                         probe: str = "heuristic"):
    """Scene-adaptive choice of the differentiable renderer (host-level).

    The diff march's ERT block skip is global, so one deep ray keeps
    every lane marching.  Two exact scene-adaptive forms fix the two ways
    scenes defeat it, with opposite win conditions (all numbers at the
    256^3/512^2/512 headline, experiments/r8_headline_results.jsonl):

    * SATURATING scenes (dense content: rays hit alpha >= 0.99 early,
      but the deepest ray pins the global skip) -> alive-ray COMPACTION
      (``config.compact_after``): uniform noise 1.52 -> 1.06 s.  On
      slow-saturating scenes compaction only adds its permutation
      overhead (phantom 2.47 -> 2.7 s).
    * STRUCTURED scenes (bounded objects, empty background: rays stay
      alive but their useful depth varies) -> :func:`render_depth_sorted`:
      phantom 2.47 -> 2.07 s, noise 1.52 -> 2.13 s.

    The reference never faces the choice — its per-thread ERT is
    scene-adaptive by construction
    (/root/reference/differender/volume_raycaster.py:267-269); this
    policy is the TPU equivalent, decided once per scene: a 128^2 probe
    render measures the alive fraction after ``compact_after`` blocks
    (compaction wins iff few rays remain), then the occupancy
    depth-spread statistic picks depth sorting vs plain.

    Returns ``(render_fn, name)`` where ``render_fn`` has the
    :func:`render` signature and ``name`` is ``"compacted"``,
    ``"depth_sorted"`` or ``"plain"``.  Call it OUTSIDE jit (it syncs
    scalars to the host); in a training loop, re-choose when the scene
    changes materially, not every step.

    ``probe``: ``"heuristic"`` (default) decides from the 128^2 alive
    fraction + depth-spread statistics with thresholds TUNED AT THE
    256^3/512^2 HEADLINE on two scenes — cheap (one probe render), but
    unguarded at very different volume sizes/TFs (a misroute costs up to
    ~2x).  ``"timed"`` instead times ONE fwd+bwd step of each candidate
    at the FULL config and returns the measured winner — scale-robust by
    construction, at the cost of compiling and running all three
    candidates once (minutes cold; amortized in any real training loop,
    and never wrong by more than measurement noise).
    """
    if probe not in ("heuristic", "timed"):
        raise ValueError(f"probe must be 'heuristic' or 'timed'; "
                         f"got {probe!r}")
    if probe == "timed":
        return _choose_diff_renderer_timed(volume, tf, look_from, config,
                                           sampling_rate, chunks,
                                           compact_after)
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    vol32 = jnp.asarray(volume, jnp.float32)
    tf32 = jnp.asarray(tf, jnp.float32)
    lf32 = jnp.asarray(look_from, jnp.float32)
    n_blocks = -(-config.diff_march_steps(float(sr)) // config.block_size)
    if 0 < compact_after < n_blocks:
        probe_cfg = config.replace(image_shape=(128, 128), compact_after=0)
        alive = float(_alive_fraction(
            vol32, tf32, lf32, probe_cfg, float(sr),
            compact_after * config.block_size))
        if alive <= alive_threshold:
            # Prefix bucket: the smallest power-of-two fraction with ~1.5x
            # slack over the measured alive fraction (marching cost is
            # ceil(alive/P) tiles of P rays; 1/16 and 1/32 measured within
            # 1% of each other at the headline — the knob is flat near the
            # optimum).
            import math
            k = min(5, max(2, int(-math.log2(max(alive, 1e-6) * 1.5))))
            cp = 2.0 ** -k

            def fn(volume, tf, look_from, config, sampling_rate=None,
                   key=None, _ca=compact_after, _cp=cp):
                return render(volume, tf, look_from,
                              config.replace(compact_after=_ca,
                                             compact_prefix=_cp),
                              sampling_rate=sampling_rate, key=key)
            return fn, "compacted"
    frac = float(_depth_spread(vol32, tf32, lf32, config, float(sr)))
    if frac > threshold:
        def fn(volume, tf, look_from, config, sampling_rate=None, key=None,
               _chunks=chunks):
            return render_depth_sorted(volume, tf, look_from, config,
                                       sampling_rate=sampling_rate,
                                       key=key, chunks=_chunks)
        return fn, "depth_sorted"
    return render, "plain"


def _choose_diff_renderer_timed(volume, tf, look_from, config,
                                sampling_rate, chunks, compact_after):
    """``choose_diff_renderer(probe="timed")``: measure one fwd+bwd step
    of each exact candidate at the full config; return the fastest.

    The chained-carry protocol (CLAUDE.md rule 4) perturbs look_from
    between the warmup and the timed step so no execution repeats.  Every
    candidate computes the same gradients (exactness tests in
    tests/test_render.py / test_grads.py), so timing is the only
    criterion; ties go to the simpler renderer (candidate order)."""
    import time as _time
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    vol32 = jnp.asarray(volume, jnp.float32)
    tf32 = jnp.asarray(tf, jnp.float32)
    lf32 = jnp.asarray(look_from, jnp.float32)
    n_blocks = -(-config.diff_march_steps(float(sr)) // config.block_size)

    candidates = [("plain", render)]
    if 0 < compact_after < n_blocks:
        # Size the prefix bucket from the alive probe (same rule as the
        # heuristic path).
        import math
        probe_cfg = config.replace(image_shape=(128, 128), compact_after=0)
        alive = float(_alive_fraction(
            vol32, tf32, lf32, probe_cfg, float(sr),
            compact_after * config.block_size))
        k = min(5, max(2, int(-math.log2(max(alive, 1e-6) * 1.5))))
        cp = 2.0 ** -k

        def fn_c(volume, tf, look_from, config, sampling_rate=None,
                 key=None, _ca=compact_after, _cp=cp):
            return render(volume, tf, look_from,
                          config.replace(compact_after=_ca,
                                         compact_prefix=_cp),
                          sampling_rate=sampling_rate, key=key)
        candidates.append(("compacted", fn_c))

    def fn_d(volume, tf, look_from, config, sampling_rate=None, key=None,
             _chunks=chunks):
        return render_depth_sorted(volume, tf, look_from, config,
                                   sampling_rate=sampling_rate,
                                   key=key, chunks=_chunks)
    candidates.append(("depth_sorted", fn_d))

    best = None
    for name, fn in candidates:
        def step(c, _fn=fn):
            lf = lf32 + c * jnp.float32(1e-6)
            g = jax.grad(lambda v, t: jnp.mean(
                _fn(v, t, lf, config, sampling_rate=sr).image ** 2),
                argnums=(0, 1))(vol32, tf32)
            return c + 1.0 + g[0].ravel()[0] * 0.0
        # ALL candidates under one jit — including depth_sorted: its
        # un-jitted host-level form enqueues every chunk's fwd+bwd
        # transients at once and RESOURCE_EXHAUSTs at headline scale
        # (r11/r20 packed_ds4 rows); one program lets XLA sequence the
        # chunks' buffers, and is also how bench.py/users run the winner.
        runner = jax.jit(step)
        c = jnp.float32(float(runner(jnp.float32(0.0))))    # warmup/compile
        t0 = _time.time()
        c = jnp.float32(float(runner(c)))
        dt = _time.time() - t0
        if best is None or dt < best[2]:
            best = (name, fn, dt)
    name, fn, _dt = best
    return (fn, name) if name != "plain" else (render, "plain")


@jax.jit
def _bw_alive_order(acc_a, n_samples, s0, thr):
    """Alive count + alive-first stable permutation for the blockwise
    compaction (the march's own prefix-closed gate; see march_diff)."""
    alive = (acc_a < thr) & (n_samples > s0)
    order = jnp.argsort(jnp.logical_not(alive)).astype(jnp.int32)
    return jnp.sum(alive.astype(jnp.int32)), order


@jax.jit
def _bw_pack_permute(order, soa, accs, cnt):
    """ONE packed (N, 16) permute of SoA + carries (gather-op count per
    CLAUDE.md rules 3/5; counts/samples round-trip f32 exactly)."""
    z = jnp.zeros_like(soa.dx)
    pack = jnp.stack([soa.dx, soa.dy, soa.dz, soa.t0, soa.dt,
                      soa.n_samples.astype(jnp.float32),
                      accs[0], accs[1], accs[2], accs[3],
                      cnt.astype(jnp.float32),
                      z, z, z, z, z], axis=1)
    return jnp.take(pack, order, axis=0)


@jax.jit
def _bw_unpermute(order, accs_p, cnt_p, dead_accs, dead_cnt):
    """Rebuild full-width carries from (compacted prefix, dead tail) in
    permuted order: ONE packed (N, 8) scatter."""
    pack = jnp.stack([
        jnp.concatenate([a, d]) for a, d in zip(accs_p, dead_accs)
    ] + [jnp.concatenate([cnt_p, dead_cnt]).astype(jnp.float32)] + [
        jnp.zeros((order.shape[0],), jnp.float32)] * 3, axis=1)
    un = jnp.zeros_like(pack).at[order].set(pack)
    return tuple(un[:, i] for i in range(4)), un[:, 4].astype(jnp.int32)


@jax.jit
def _bw_permute_d(order, d_accs):
    """Transpose of _bw_unpermute's scatter for the head cotangent: one
    packed take into compacted order."""
    pack = jnp.stack(list(d_accs)
                     + [jnp.zeros_like(d_accs[0])] * 4, axis=1)
    return jnp.take(pack, order, axis=0)


@jax.jit
def _bw_expand_d(order, d_accs_p, d_dead):
    """Transpose of the forward's pack/permute/slice at the split
    boundary: concat the prefix and dead-tail cotangents and un-permute
    back to ray order (one packed scatter)."""
    pack = jnp.stack([
        jnp.concatenate([a, d]) for a, d in zip(d_accs_p, d_dead)
    ] + [jnp.zeros((order.shape[0],), jnp.float32)] * 4, axis=1)
    un = jnp.zeros_like(pack).at[order].set(pack)
    return tuple(un[:, i] for i in range(4))


def value_and_grad_blockwise(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    loss_fn,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    ert: bool = True,
    loss_args: tuple = (),
):
    """Loss + (d_volume, d_tf) via a HOST-level per-march-block backward.

    Semantically identical to ``jax.value_and_grad`` over
    ``loss_fn(render(...))`` w.r.t. ``(volume, tf)`` — same block math,
    same ERT gating, same custom VJPs — but partitioned into FIVE small
    jit programs instead of one monolith:

      1. one ray/SoA setup program (``_blockwise_rays_program``);
      2. in sorted mode, one march-table prep program (the multi-GB
         table build stays out of every block program's buffer budget);
      3. one forward-block program, reused for every block (``s0`` is a
         traced argument), with the per-block entry carries saved on
         device (``n_blocks * 5 * H * W`` floats — a few MB);
      4. one loss-head program (final image + ``loss_fn``), whose VJP
         yields the carry cotangent;
      5. one backward-block program reused in reverse block order with
         gradient accumulation.  In AD mode it is the VJP of one block;
         in sorted mode the backward is SPLIT one level further into
      6. a cotangent program (march recompute + composite/TF VJP,
         emitting the per-sample (4, K, N) cotangent stack) and a
         placement program (positions recomputed from the ray SoA +
         :func:`differender_tpu.sampling.sorted_place_cot` into a
         donated d_volume accumulator).

    Why: at 512^3 the monolithic backward with ``march_vjp='sorted'``
    exceeds the remote-compile helper's buffer-pressure limit at EVERY
    strip count / box / window size (experiments/r5_sorted512_results
    .jsonl), yet the sorted placement loop compiles and runs standalone
    — and the r6_bisect512 rows show even ONE block's march recompute
    plus ONE placement instance in one program is over the limit, while
    each half compiles alone.  Strips shrink the RAYS axis but keep all
    blocks (and all placement instances) in one program; this partitions
    the BLOCKS axis and then splits each block's backward at the
    sampler boundary, so no program ever holds the march table and the
    volume-grad accumulator together.

    Do NOT wrap this in an outer ``jax.jit`` — that inlines the host loop
    back into one program and forfeits the size bound (same caveat as
    :func:`render_strips`).  Gradients w.r.t. ``look_from`` are not
    available (rays are built eagerly on the host); use plain
    :func:`render` for camera gradients.

    KNOWN LIMIT (measured): ``config.compact_after > 0`` works at small
    scale (the multichip dryrun cross-checks it against monolithic AD)
    but does NOT compile at 512^3 on this stack — the alive-order +
    packed-take programs push the per-block backward over the remote
    compile helper's budget (r18: three deterministic
    ``tpu_compile_helper subprocess exit code 1`` crashes across rounds;
    experiments/r5_sorted512_results.jsonl).  At that scale run it
    uncompacted (warm 512^3/512^2 steps ~9.5-9.9 s, ≈ monolithic-AD
    speed with one block's working set of peak memory).

    Args:
        loss_fn: maps ``(RenderOutput, *loss_args)`` to a scalar loss.
            Must be a STABLE, PURE function: the jitted loss head is
            cached on ``loss_fn``'s identity, so a fresh lambda per
            training step recompiles the head every step, and a reused
            function object whose closure is mutated between calls
            serves stale baked-in constants.  Pass per-step data (e.g.
            target images) via ``loss_args``, which are traced jit
            arguments and are differentiated around correctly.
        loss_args: extra traced arrays forwarded to ``loss_fn`` (no
            gradients are returned for them).
    Returns:
        (loss, (d_volume, d_tf))
    """
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    if config.march_vjp == "tiled":
        raise ValueError("value_and_grad_blockwise supports march_vjp "
                         "'ad' and 'sorted', not 'tiled'")
    if config.camera_grads:
        # Rays are built eagerly on the host (see docstring) and the defer
        # VJP routes only volume cotangents through its mailbox, so a
        # look_from gradient cannot flow here.  Refuse loudly — the
        # monolithic render() path serves camera grads (march_vjp 'ad' or
        # 'sorted').
        raise ValueError(
            "camera_grads=True is unsupported on the blockwise backward; "
            "use render()/value_and_grad over it (march_vjp='ad' or "
            "'sorted') for camera gradients")
    kind = config.resolved_march_table()
    if config.march_vjp == "sorted" and kind not in ("super64", "super64s2"):
        # Same constraint as march_diff (render.py:416): with any other
        # table the sorted hand-VJP branch never fires, and because the
        # blockwise path stop_gradient's vol_op, d_volume would be
        # silently all zeros instead of an error.
        raise ValueError(
            "march_vjp='sorted' requires march_table super64 or "
            f"super64s2; got {kind}")
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    H, W = config.image_shape
    N = H * W
    n_steps = config.diff_march_steps(float(sr))
    block = max(1, min(config.block_size, n_steps))
    n_blocks = -(-n_steps // block)
    prep_vol, fwd_block, bwd_block, place_block = _blockwise_programs(
        config, float(sr), ert, block)
    loss_head = _blockwise_head(loss_fn, config)
    setup = _blockwise_rays_program(config, float(sr), key is not None)
    origin, ray_n_samples, soa = setup(
        jnp.asarray(look_from, jnp.float32),
        key if key is not None else jax.random.PRNGKey(0))
    vol_tbl = prep_vol(volume) if prep_vol is not None else None

    zero = jnp.zeros((N,), jnp.float32)
    accs = (zero, zero, zero, zero)
    cnt = jnp.ones((N,), jnp.int32)
    carries = []
    # HOST-level alive-ray compaction (config.compact_after): the per-
    # block sync below means the alive count is ~free to fetch, and
    # termination is MONOTONE (acc alpha never decreases; remaining
    # samples never increase), so ONE prefix bucket P >= alive(split) is
    # exact for every later block — no fallback machinery needed, just a
    # re-specialization of the same jit programs at the smaller width.
    # Skipped when more than half the rays are alive at the split.
    ca = (config.compact_after
          if 0 < config.compact_after < n_blocks and ert else 0)
    order = None
    soa_c = soa
    P = 0
    for b in range(n_blocks):
        if ca and b == ca:
            n_alive, order = _bw_alive_order(
                accs[3], soa.n_samples, jnp.int32(b * block),
                config.ert_threshold)
            n_alive = int(n_alive)
            for kk in (4, 3, 2, 1):
                if n_alive <= (N >> kk):
                    P = N >> kk
                    break
            if P:
                pk = _bw_pack_permute(order, soa, accs, cnt)
                soa_c = _RaySoA(dx=pk[:P, 0], dy=pk[:P, 1], dz=pk[:P, 2],
                                t0=pk[:P, 3], dt=pk[:P, 4],
                                n_samples=pk[:P, 5].astype(jnp.int32))
                accs = tuple(pk[:P, 6 + i] for i in range(4))
                cnt = pk[:P, 10].astype(jnp.int32)
                dead_accs = tuple(pk[P:, 6 + i] for i in range(4))
                dead_cnt = pk[P:, 10].astype(jnp.int32)
            else:
                order = None
        carries.append((accs, cnt))
        soa_b = soa_c if (P and b >= ca) else soa
        accs, cnt = fwd_block(volume, tf, vol_tbl, soa_b, origin, accs,
                              cnt, jnp.int32(b * block))
        # Serialize the forward too: the runtime allocates each enqueued
        # execution's output/temp buffers at ENQUEUE time, so a warm step
        # (no compiles interleaved to drain the queue) that dispatches all
        # n_blocks forward blocks at once holds every block's transients
        # simultaneously.  That is why the cold 512^3 step completed while
        # the immediately-following warm step hit RESOURCE_EXHAUSTED even
        # after a 30 s settle (experiments/exp_r12_bw512_steps.py rows in
        # r5_sorted512_results.jsonl).  One sync per block bounds live
        # memory at a single block's working set for dispatch-latency-only
        # cost, same as the backward loop below.
        jax.block_until_ready(accs)

    if P:
        accs_full, cnt_full = _bw_unpermute(order, accs, cnt, dead_accs,
                                            dead_cnt)
    else:
        accs_full, cnt_full = accs, cnt
    loss, head_vjp = jax.vjp(
        lambda a: loss_head(a, cnt_full, ray_n_samples, loss_args),
        accs_full)
    (d_accs,) = head_vjp(jnp.float32(1.0))
    if P:
        # The unpermute above is linear: its transpose re-permutes the
        # head cotangent into compacted order.  The dead tail's cotangent
        # bypasses every tail block (their carries pass through unchanged)
        # and rejoins at the split boundary below.
        dp = _bw_permute_d(order, d_accs)
        d_accs = tuple(dp[:P, i] for i in range(4))
        d_dead = tuple(dp[P:, i] for i in range(4))

    d_tf = jnp.zeros_like(tf)
    if place_block is not None:
        # Split backward (sorted mode): march-recompute cotangents and
        # sorted-window placement in separate programs.  The volume-grad
        # accumulator stays in the placement's FLAT (stride-2:
        # half-lattice) form across blocks and is DONATED so each block
        # updates it in place; one finalize program interleaves it to the
        # voxel lattice at the end.
        from .sampling import sorted_acc_shape
        spec = _block_sample_spec(config, config.resolved_march_table(),
                                  _safe_supercell_group(config, float(sr),
                                                        block), True)
        d_acc = jnp.zeros(sorted_acc_shape(spec), jnp.float32)
        for b in range(n_blocks - 1, -1, -1):
            accs_b, cnt_b = carries[b]
            s0 = jnp.int32(b * block)
            soa_b = soa_c if (P and b >= ca) else soa
            dt, d_accs, cots = bwd_block(tf, vol_tbl, soa_b, origin,
                                         accs_b, cnt_b, s0, d_accs)
            d_acc = place_block(d_acc, soa_b, origin, s0, cots)
            d_tf = d_tf + dt
            if P and b == ca:
                # Split boundary: rejoin the dead tail's head cotangent
                # (which bypassed every tail block) and undo the
                # compaction permutation — the exact transpose of the
                # forward's pack/permute/slice.
                d_accs = _bw_expand_d(order, d_accs, d_dead)
            # Serialize: JAX's async dispatch otherwise queues EVERY
            # block's backward at once, keeping each in-flight block's
            # transients (the (4, B, N) cotangent stack + the (M, 64)
            # fold rows — ~1.2 GB/block at 512^3 b32) alive together;
            # that, not any single program, exhausted HBM in the first
            # 512^3 runs (r5_sorted512_results.jsonl RESOURCE_EXHAUSTED
            # rows).  One sync per block costs dispatch latency only.
            jax.block_until_ready(d_acc)
        d_volume = place_block.finalize(d_acc)
    else:
        d_volume = jnp.zeros_like(volume)
        for b in range(n_blocks - 1, -1, -1):
            accs_b, cnt_b = carries[b]
            s0 = jnp.int32(b * block)
            soa_b = soa_c if (P and b >= ca) else soa
            dv, dt, d_accs = bwd_block(volume, tf, vol_tbl, soa_b, origin,
                                       accs_b, cnt_b, s0, d_accs)
            d_volume = d_volume + dv
            d_tf = d_tf + dt
            if P and b == ca:
                d_accs = _bw_expand_d(order, d_accs, d_dead)
            # Same warm-step enqueue-pressure bound as the forward loop:
            # each AD block's VJP transients (and the full-lattice dv)
            # must not pile up across enqueued blocks.
            jax.block_until_ready(d_volume)
    return loss, (d_volume, d_tf)


@functools.lru_cache(maxsize=32)
def _blockwise_rays_program(config: RenderConfig, sr: float, jittered: bool):
    """ONE jitted program for the whole ray/SoA setup of
    :func:`value_and_grad_blockwise`.

    Eager ``make_rays`` at 512^2 shapes emits dozens of small eager ops;
    on the axon stack each is its own remote compile, and many short-lived
    compiles congest the helper (CLAUDE.md rule 6).  Tracing the setup
    keeps the host-level loop's program count bounded (five total)."""

    @jax.jit
    def setup(look_from, key):
        rays = make_rays(look_from, config, sr,
                         jitter_key=key if jittered else None)
        params = march_params(rays)
        return rays.origin, rays.n_samples, _ray_soa(rays, params)

    return setup


@functools.lru_cache(maxsize=32)
def _blockwise_head(loss_fn, config: RenderConfig):
    """Jitted loss head for :func:`value_and_grad_blockwise`, cached per
    (loss_fn, config) so repeated training steps reuse the compile.

    ``loss_fn`` must be a stable, pure function (see
    :func:`value_and_grad_blockwise`): the cache keys on its identity and
    jit bakes in its closure at first trace.  Per-step data (targets)
    belongs in ``loss_args``, which is a traced jit argument here."""
    H, W = config.image_shape

    @jax.jit
    def loss_head(accs, cnt, ns, loss_args):
        img = jnp.stack(accs, axis=-1).reshape(H, W, 4)
        out = RenderOutput(image=img, valid_steps=cnt.reshape(H, W),
                           n_samples=ns)
        return loss_fn(out, *loss_args)

    return loss_head


@functools.lru_cache(maxsize=32)
def _blockwise_programs(config: RenderConfig, sr: float, ert: bool,
                        block: int):
    """The two reusable jit programs of :func:`value_and_grad_blockwise`
    (one forward block, one backward block), cached on the static
    configuration — ``s0`` and all arrays are traced arguments, so every
    block of every training step reuses the same two compiles."""
    grp = _safe_supercell_group(config, sr, block)
    sorted_vjp = config.march_vjp == "sorted"
    kind = config.resolved_march_table()

    if sorted_vjp:
        # The march table gets its OWN program.  In sorted mode the table
        # is stop_gradient'd (d_volume comes from the hand-VJP's sorted
        # placement, not through the table build), so it can be built
        # once per step and passed to every block as a plain argument.
        # This matters twice at 512^3: the (X*Y*Z/8, 64) stride-2 table
        # is 4.3 GB, and (a) rebuilding it inside each of the 2*n_blocks
        # block calls wastes HBM bandwidth, (b) its build intermediates
        # push the per-block programs over the remote compile helper's
        # buffer-pressure limit (experiments/r5_sorted512_results.jsonl,
        # r6_bisect512 rows: the b64 fwd block with an inline table build
        # fails to compile; the same block with the table as an argument
        # is the fix this hoist encodes).
        @jax.jit
        def prep_vol(v):
            return _prep_volume(v, config)[1]
    else:
        prep_vol = None

    def _one_block(v, t, vol_tbl, soa_, origin_, accs, cnt, s0,
                   cot_sink=None):
        """One march block: the body of :func:`march_diff`'s scan.  In
        sorted mode ``vol_tbl`` is the hoisted march table (see
        ``prep_vol``); in AD mode it is None and the table build is
        traced into the block so d_volume flows through it.  With
        ``cot_sink`` (split backward only) the sampler's VJP routes the
        per-sample cotangents out through the sink instead of placing
        them (``v`` is then unused)."""
        if sorted_vjp:
            kind_op = kind
            vol_op = jax.lax.stop_gradient(vol_tbl)
            tv = v if cot_sink is None else cot_sink
            mode = config.march_vjp if cot_sink is None else "defer"
        else:
            kind_op, vol_op = _prep_volume(v, config)
            tv = None
            mode = config.march_vjp
        tf_op = _prep_tf(t, config)

        def eval_block(carry, s0):
            a, c = carry
            steps = s0 + jnp.arange(block, dtype=jnp.int32)
            pr, pg, pb, pa, _, in_range = _eval_block_soa(
                (kind_op, vol_op), tf_op, origin_,
                soa_, steps, jnp.float32(sr), config, clamp_light=True,
                super_group=grp, tiled_volume=tv,
                n_tiles=1, vjp_mode=mode)
            a, c, _ = composite_block_soa(a, c, pr, pg, pb, pa,
                                          in_range, config, ert=ert)
            return (a, c), None

        eval_block = jax.checkpoint(
            eval_block,
            policy=jax.checkpoint_policies.save_only_these_names(
                "march_intensity", "march_gx", "march_gy", "march_gz",
                "march_alpha"),
            prevent_cse=False)
        if ert and config.ert_block_skip:
            alive = jnp.any((accs[3] < config.ert_threshold)
                            & (soa_.n_samples > s0))
            (accs, cnt), _ = jax.lax.cond(
                alive, eval_block, lambda c_, _s: (c_, None),
                (accs, cnt), s0)
        else:
            (accs, cnt), _ = eval_block((accs, cnt), s0)
        return accs, cnt

    fwd_block = jax.jit(_one_block)

    if sorted_vjp:
        # SPLIT backward (the 512^3 design point): the march recompute and
        # the sorted-window placement get SEPARATE programs.  The
        # r6_bisect512 rows show each half compiles standalone at
        # 512^3-s2 shapes while their union exceeds the remote compile
        # helper's buffer budget at every block size: the cot program
        # holds the multi-GB march table, the placement program holds the
        # (X,Y,Z) accumulator — never both.
        @jax.jit
        def bwd_cot(t, vol_tbl, soa_, origin_, accs, cnt, s0, d_accs):
            # cnt is an int carry: non-differentiable, held fixed; only
            # the accs cotangent flows here.  The sink width follows the
            # RAY width of the inputs (not config.image_shape): compacted
            # blocks call this with an alive-prefix-sized SoA and jit
            # re-specializes per width.
            sink = jnp.zeros((4, block, soa_.dx.shape[0]), jnp.float32)
            _, vjp = jax.vjp(
                lambda t_, a_, sink_: _one_block(
                    None, t_, vol_tbl, soa_, origin_, a_, cnt, s0,
                    cot_sink=sink_)[0],
                t, accs, sink)
            d_tf, d_accs_prev, cots = vjp(d_accs)
            return d_tf, d_accs_prev, cots

        @jax.jit
        def fold_block(soa_, origin_, s0, cots):
            from .sampling import sorted_fold_cot
            steps = s0 + jnp.arange(block, dtype=jnp.int32)
            px, py, pz = _block_positions(origin_, soa_, steps)
            spec = _block_sample_spec(config, kind, grp, True)
            return sorted_fold_cot(spec, px, py, pz, cots)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def place_rows(d_acc, base, d_rows):
            from .sampling import sorted_accumulate
            spec = _block_sample_spec(config, kind, grp, True)
            return sorted_accumulate(spec, d_acc, base, d_rows)

        @jax.jit
        def place_finalize(d_acc):
            from .sampling import sorted_finalize
            spec = _block_sample_spec(config, kind, grp, True)
            return sorted_finalize(spec, d_acc)

        def place_block(d_acc, soa_, origin_, s0, cots):
            # TWO programs on purpose: the fold's (Mg, 64) hat-weight
            # intermediates and the placement's flat accumulator each
            # fill most of the compile helper's buffer budget alone
            # (r6_bisect512: fused fold+place fails at 512^3 where
            # _sorted_volume_grad compiled at 2x the row count).  The
            # accumulator stays in FLAT (stride-2: half-lattice) form
            # across blocks — place_finalize interleaves/reshapes it to
            # (X, Y, Z) once per step in its own tiny program, so no
            # per-block program holds the full voxel lattice alongside
            # the placement intermediates (the last ~1 GB of live-buffer
            # pressure the r5 split runs still crashed on).
            base, d_rows = fold_block(soa_, origin_, s0, cots)
            return place_rows(d_acc, base, d_rows)

        # Expose the jitted pieces for AOT bisection/attribution
        # (experiments/exp_r6_blockwise512_bisect.py).
        place_block.fold_block = fold_block
        place_block.place_rows = place_rows
        place_block.finalize = place_finalize
        return prep_vol, fwd_block, bwd_cot, place_block

    @jax.jit
    def bwd_block(v, t, vol_tbl, soa_, origin_, accs, cnt, s0, d_accs):
        # cnt is an int carry: non-differentiable, held fixed; the block's
        # output counts are recomputed by the forward pass that saved the
        # carries, so only the accs cotangent flows here.
        _, vjp = jax.vjp(
            lambda v_, t_, a_: _one_block(v_, t_, vol_tbl, soa_, origin_,
                                          a_, cnt, s0)[0], v, t, accs)
        return vjp(d_accs)

    return prep_vol, fwd_block, bwd_block, None


def value_and_grad_render(
    volume: Array,
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    loss_fn,
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    ert: bool = True,
    loss_args: tuple = (),
):
    """Loss + (d_volume, d_tf) with the gradient STRATEGY auto-selected.

    Configs that fit one program get the monolithic
    ``jax.value_and_grad(loss_fn(render(...)))``; 512^3-class sorted
    configs (``config.use_blockwise_grad()``) get the host-level
    blockwise split backward, which is the only form whose programs all
    fit the remote TPU compile budget at that scale.  Both strategies
    compute the same gradients (tests/test_grads.py TestBlockwiseVJP).

    ``loss_fn`` maps ``(RenderOutput, *loss_args)`` to a scalar; see
    :func:`value_and_grad_blockwise` for its stability contract (which
    only binds on the blockwise path).
    """
    if config.use_blockwise_grad():
        return value_and_grad_blockwise(volume, tf, look_from, config,
                                        loss_fn, sampling_rate, key, ert,
                                        loss_args)
    sr = config.sampling_rate if sampling_rate is None else sampling_rate

    def _loss(v, t):
        out = render(v, t, jnp.asarray(look_from, jnp.float32), config,
                     sr, key=key, ert=ert)
        return loss_fn(out, *loss_args)

    return jax.value_and_grad(_loss, argnums=(0, 1))(
        jnp.asarray(volume, jnp.float32), jnp.asarray(tf, jnp.float32))


@functools.partial(jax.jit, static_argnames=("config", "sampling_rate", "ert"))
def render_jit(volume, tf, look_from, config: RenderConfig,
               sampling_rate=None, key=None, ert=True):
    return render(volume, tf, look_from, config, sampling_rate, key, ert)


@functools.partial(jax.jit, static_argnames=("config", "sampling_rate"))
def render_nondiff_jit(volume, tf, look_from, config: RenderConfig,
                       sampling_rate=None, key=None):
    return render_nondiff(volume, tf, look_from, config, sampling_rate, key)
