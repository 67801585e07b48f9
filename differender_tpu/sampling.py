"""Volume sampling and transfer-function lookup.

Exact functional re-derivations of:
  * ``low_high_frac``            — `/root/reference/differender/volume_raycaster.py:7-21`
  * ``sample_volume_trilinear``  — `:153-189`
  * ``get_volume_normal``        — `:191-203`
  * ``apply_transfer_function``  — `:205-219`

TPU notes: the 8-corner trilinear fetch is issued as ONE flat gather of shape
``(..., 8)`` (XLA lowers to a single gather HLO; its transpose is a single
scatter-add — the gradient path into the volume).  The 6 extra normal samples
are batched into the same gather, so one march step costs exactly one
``(..., 7, 8)`` gather from the volume plus one ``(..., 2)`` gather from the
TF texture.
"""
from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Offsets of the 8 cell corners (x-major like the reference's unrolled loads,
# `/root/reference/differender/volume_raycaster.py:173-189`).
# NOTE: kept as numpy so they lower to inline MLIR constants (a module-level
# jax.Array would be committed to the default device at import and fetched
# back at every trace — pathological over a remote-TPU tunnel).
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    np.int32,
)  # (8, 3)


def voxel_coords(pos: Array, volume_shape) -> Array:
    """Map world positions in [-1,1]^3 to continuous voxel coordinates.

    ``clamp(0.5*pos + 0.5, 0, 1) * (shape - 1 - 1e-4)``
    (`/root/reference/differender/volume_raycaster.py:163-165`); the ``1e-4``
    keeps ``floor+1`` in range.
    """
    scale = np.asarray(volume_shape, np.float32) - 1.0 - np.float32(1e-4)
    return jnp.clip(0.5 * pos + 0.5, 0.0, 1.0) * scale


_CORNER_BITS = _CORNERS.astype(np.float32)  # (8, 3) 0/1


def _corner_weights(frac: Array) -> Array:
    """Trilinear corner weights; frac (..., 3) -> (..., 8).

    Weight of corner c = prod_axis (frac if c[axis] else 1-frac) — the closed
    form of the reference's 7-lerp tree (`:173-189`).  Computed directly in
    the flat (..., 8) layout: intermediate (..., 2, 2, 2) broadcasts acquire
    tile-padded TPU layouts that inflate memory ~64x at scale."""
    w = jnp.ones(frac.shape[:-1] + (8,), frac.dtype)
    for ax in range(3):
        f = frac[..., ax][..., None]
        bit = _CORNER_BITS[:, ax]
        w = w * (f * bit + (1.0 - f) * (1.0 - bit))
    return w


def corner_indices_weights(pos: Array, volume_shape):
    """Per-axis corner index components and trilinear weights for world
    positions ``pos`` (..., 3).  Exact reference semantics
    (`/root/reference/differender/volume_raycaster.py:153-189`): per-axis
    ``low = floor(max(coord, 0))``, ``high = min(low+1, axis_len-1)``,
    ``frac = coord - low`` (frac computed before the high clamp).

    TPU layout note: the components are returned SEPARATELY as (..., 8)
    arrays rather than stacked into (..., 8, 3) — a stacked index tensor
    forces XLA to materialize a physically transposed s32 copy (observed at
    ~1 s for a 512-step march block) before the gather custom-fusion.

    Returns: (ix, iy, iz) each (..., 8) int32, weights (..., 8) f32.
    """
    X, Y, Z = volume_shape
    pv = voxel_coords(pos, volume_shape)          # (..., 3), >= 0 by clamp
    low = jnp.floor(pv)
    frac = pv - low
    low = low.astype(jnp.int32)                   # (..., 3)

    def axis_idx(ax, size):
        lo = low[..., ax]
        hi = jnp.minimum(lo + 1, size - 1)        # clamp highs (`:170-172`)
        bit = _CORNERS[:, ax]                     # (8,) 0/1 numpy constant
        return lo[..., None] * (1 - bit) + hi[..., None] * bit

    ix = axis_idx(0, X)
    iy = axis_idx(1, Y)
    iz = axis_idx(2, Z)
    return ix, iy, iz, _corner_weights(frac)


def corner_flat_weights(pos: Array, volume_shape):
    """Flattened gather indices ``(x*Y + y)*Z + z`` and weights, (..., 8)."""
    _, Y, Z = volume_shape
    ix, iy, iz, w = corner_indices_weights(pos, volume_shape)
    return (ix * Y + iy) * Z + iz, w


def trilinear(volume: Array, pos: Array) -> Array:
    """Trilinearly sample ``volume`` (X, Y, Z) at world positions ``pos``
    (..., 3) in [-1,1]^3 (reference ``sample_volume_trilinear``)."""
    flat, w = corner_flat_weights(pos, volume.shape)           # (..., 8)
    vals = _gather_flat(volume, flat)                          # one gather
    return jnp.sum(vals * w, axis=-1)


def _gather_flat(volume: Array, flat_idx: Array) -> Array:
    """Gather with 1D-flattened indices.  TPU layout note: 1D s32 index
    tensors get the clean ``T(1024)`` layout; higher-rank index tensors have
    been observed to trigger multi-GB padded copies (tile padding on tiny
    minor dims) and second-long transposes."""
    shape = flat_idx.shape
    vals = jnp.take(volume.reshape(-1), flat_idx.reshape(-1), axis=0)
    return vals.reshape(shape)


def trilinear_shard(padded: Array, pos: Array, global_shape, x_start) -> Array:
    """Trilinear sampling against an X-sharded volume block.

    ``padded`` is the local shard plus halos, covering global x indices
    ``[x_start, x_start + padded.shape[0])``.  Corner indices are computed in
    GLOBAL coordinates (bit-identical to the unsharded path) and then
    localized; out-of-shard lanes (masked by the caller's ownership test)
    are clamped into the block to stay in bounds.
    """
    Y, Z = padded.shape[1], padded.shape[2]
    ix, iy, iz, w = corner_indices_weights(pos, global_shape)
    lx = jnp.clip(ix - x_start, 0, padded.shape[0] - 1)
    flat = (lx * Y + iy) * Z + iz
    vals = _gather_flat(padded, flat)
    return jnp.sum(vals * w, axis=-1)


# The 7 sample points of a shaded march step: the center plus +-delta along
# each axis (`/root/reference/differender/volume_raycaster.py:191-203`).
_NORMAL_OFFSETS = np.array(
    [[0, 0, 0],
     [1, 0, 0], [-1, 0, 0],
     [0, 1, 0], [0, -1, 0],
     [0, 0, 1], [0, 0, -1]],
    np.float32,
)  # (7, 3)


def sample_with_gradient(volume: Array, pos: Array, delta: float = 1e-3):
    """Fetch intensity and the (unnormalized) central-difference gradient.

    One batched gather covers all 7 trilinear points (56 corner loads per
    sample, matching the reference's hot-path cost, SURVEY §3.1).

    Returns:
        intensity: (...,) trilinear sample at ``pos``.
        grad: (..., 3) ``[T(p+dx)-T(p-dx), ...]`` — NOT normalized; the
            reference normalizes in ``get_volume_normal`` (`:203`), which we
            defer to shading so the zero-gradient case can be handled the way
            CUDA's ``fmaxf(nan, 0) == 0`` implicitly does.
    """
    pts = pos[..., None, :] + delta * _NORMAL_OFFSETS          # (..., 7, 3)
    vals = trilinear(volume, pts)                              # (..., 7)
    return _split_value_gradient(vals)


def _split_value_gradient(vals: Array):
    intensity = vals[..., 0]
    grad = jnp.stack(
        [vals[..., 1] - vals[..., 2],
         vals[..., 3] - vals[..., 4],
         vals[..., 5] - vals[..., 6]],
        axis=-1,
    )
    return intensity, grad


def sample_with_gradient_shard(padded: Array, pos: Array, global_shape,
                               x_start, delta: float = 1e-3):
    """Sharded-volume variant of :func:`sample_with_gradient`; the +-delta
    stencil reaches at most 2 voxels past the ownership slab, covered by the
    exchanged halos (see :mod:`differender_tpu.parallel.volume_sharding`)."""
    pts = pos[..., None, :] + delta * _NORMAL_OFFSETS
    vals = trilinear_shard(padded, pts, global_shape, x_start)
    return _split_value_gradient(vals)


def sample_with_gradient_analytic(volume: Array, pos: Array,
                                  delta: float = 1e-3):
    """Fast-mode sampling: intensity + gradient from ONE 8-corner fetch.

    Instead of the reference's 6 extra trilinear samples (central differences
    at +-delta, 56 gathers/sample), the gradient is the analytic in-cell
    derivative of the trilinear interpolant, scaled to match the reference's
    central-difference magnitude (``2*delta`` in normalized coords =
    ``delta * (shape-1)`` in voxel coords; the normal is normalized anyway).

    NON-PARITY: values are identical to the reference; normals differ where
    the +-delta stencil crosses cell boundaries.  Enable via
    ``RenderConfig(analytic_normals=True)`` — ~7x fewer gathered elements on
    gather-bound backends.
    """
    X, Y, Z = volume.shape
    pv_scale = np.asarray(volume.shape, np.float32) - 1.0 - np.float32(1e-4)
    ix, iy, iz, w = corner_indices_weights(pos, volume.shape)
    flat = (ix * Y + iy) * Z + iz
    vals = _gather_flat(volume, flat)             # (..., 8)

    intensity = jnp.sum(vals * w, axis=-1)

    # dT/d(frac_axis): replace that axis' weight factor with +-1 by corner bit
    pv = voxel_coords(pos, volume.shape)
    frac = pv - jnp.floor(pv)
    grads = []
    for ax in range(3):
        dw = jnp.ones(frac.shape[:-1] + (8,), frac.dtype)
        for ax2 in range(3):
            bit = _CORNER_BITS[:, ax2]
            if ax2 == ax:
                dw = dw * (2.0 * bit - 1.0)       # d/df of (f*b + (1-f)(1-b))
            else:
                f = frac[..., ax2][..., None]
                dw = dw * (f * bit + (1.0 - f) * (1.0 - bit))
        # scale: central difference over 2*delta in world = delta * scale
        # voxels; d(frac)/d(voxel) = 1 within the cell.
        grads.append(jnp.sum(vals * dw, axis=-1) * (delta * pv_scale[ax]))
    grad = jnp.stack(grads, axis=-1)
    return intensity, grad


# ---------------------------------------------------------------------------
# SoA (structure-of-arrays) sampling path — the TPU hot-path layout.
#
# The AoS forms above materialize (..., 3) position and (..., 4) RGBA
# tensors whose tiny minor dims acquire tile-padded TPU layouts (up to 32-64x
# memory inflation at fusion boundaries), and issue one gather HLO per
# call-site (each ~55 ms flat on this stack).  The SoA path keeps every
# hot tensor in clean (K, N) / (8, K, N) shapes (minor dims are the large
# flattened-pixel axis) and issues exactly ONE volume gather and ONE TF
# gather per march block:
#   * the 8 cell corners are addressed by per-sample base index + per-axis
#     0/1 step offsets (clamped highs baked into the steps), so the corner
#     index tensor is base[None] + bits*steps — no (..., 8, 3) stacking;
#   * the TF lerp reads a precombined (R, 8) low/high table
#     [tf[i], tf[min(i+1, R-1)]] with one gather instead of two.
# Semantics are bit-identical to the AoS functions (same reference math).
# ---------------------------------------------------------------------------

def _axis_bits(ax: int, ndim: int):
    """Corner bit pattern for an axis, shaped (8,) + (1,)*ndim (numpy)."""
    return _CORNER_BITS[:, ax].reshape((8,) + (1,) * ndim)


def corner_soa(volume_shape, px: Array, py: Array, pz: Array):
    """Corner gather indices and per-axis weight factors, SoA layout.

    Args:
        px/py/pz: (...,) world coordinates in [-1, 1] (any equal shapes).
    Returns:
        idx8: (8, ...) int32 flat gather indices into ``volume.reshape(-1)``.
        (wx, wy, wz): (8, ...) per-axis lerp factors; the trilinear weight is
            their product, and the analytic in-cell derivative along an axis
            replaces that axis' factor with ``2*bit - 1``.
    Exact reference semantics (`/root/reference/differender/volume_raycaster.py:153-189`):
    per-axis ``low = floor(clamped coord)``, ``high = min(low+1, size-1)``,
    ``frac`` from the unclamped low.
    """
    X, Y, Z = volume_shape
    nd = px.ndim

    def axis(p, size):
        scale = np.float32(size - 1.0 - 1e-4)
        v = jnp.clip(0.5 * p + 0.5, 0.0, 1.0) * scale
        lo_f = jnp.floor(v)
        frac = v - lo_f
        lo = lo_f.astype(jnp.int32)
        step = jnp.minimum(lo + 1, size - 1) - lo          # 0/1 (clamped)
        return lo, step, frac

    lx, sx, fx = axis(px, X)
    ly, sy, fy = axis(py, Y)
    lz, sz, fz = axis(pz, Z)

    base = (lx * Y + ly) * Z + lz                          # (...,)
    bx, by, bz = (_axis_bits(a, nd) for a in range(3))
    ibx, iby, ibz = (b.astype(np.int32) for b in (bx, by, bz))
    idx8 = (base[None]
            + ibx * (sx * (Y * Z))[None]
            + iby * (sy * Z)[None]
            + ibz * sz[None])                              # (8, ...)
    wx = fx[None] * bx + (1.0 - fx)[None] * (1.0 - bx)
    wy = fy[None] * by + (1.0 - fy)[None] * (1.0 - by)
    wz = fz[None] * bz + (1.0 - fz)[None] * (1.0 - bz)
    return idx8, (wx, wy, wz)


def sample_soa_analytic(vol_flat: Array, volume_shape, px, py, pz,
                        delta: float = 1e-3):
    """Intensity + analytic in-cell gradient from ONE gather, SoA.

    Equivalent to :func:`sample_with_gradient_analytic` (same math, SoA
    layout): values exact, gradient is the analytic derivative of the
    trilinear interpolant scaled to the reference's central-difference
    magnitude.
    Returns: intensity (...,), (gx, gy, gz) (...,).
    """
    X, Y, Z = volume_shape
    idx8, (wx, wy, wz) = corner_soa(volume_shape, px, py, pz)
    vals = jnp.take(vol_flat, idx8.reshape(-1), axis=0).reshape(idx8.shape)

    nd = px.ndim
    dbx, dby, dbz = (2.0 * _axis_bits(a, nd) - 1.0 for a in range(3))
    intensity = jnp.sum(vals * (wx * wy * wz), axis=0)
    sc = [np.float32(delta * (s - 1.0 - 1e-4)) for s in (X, Y, Z)]
    gx = jnp.sum(vals * (dbx * wy * wz), axis=0) * sc[0]
    gy = jnp.sum(vals * (wx * dby * wz), axis=0) * sc[1]
    gz = jnp.sum(vals * (wx * wy * dbz), axis=0) * sc[2]
    return intensity, (gx, gy, gz)


def sample_soa_parity(vol_flat: Array, volume_shape, px, py, pz,
                      delta: float = 1e-3):
    """Intensity + central-difference gradient (full reference parity,
    `/root/reference/differender/volume_raycaster.py:191-203`), SoA: the 7
    stencil points (center, +-delta per axis) are batched into ONE gather of
    shape (8, 7, ...).
    Returns: intensity (...,), (gx, gy, gz) (...,).
    """
    nd = px.ndim
    off = _NORMAL_OFFSETS.reshape((7, 3) + (1,) * nd)      # numpy
    d = np.float32(delta)
    pxs = px[None] + d * off[:, 0]
    pys = py[None] + d * off[:, 1]
    pzs = pz[None] + d * off[:, 2]
    idx8, (wx, wy, wz) = corner_soa(volume_shape, pxs, pys, pzs)
    vals = jnp.take(vol_flat, idx8.reshape(-1), axis=0).reshape(idx8.shape)
    tri = jnp.sum(vals * (wx * wy * wz), axis=0)           # (7, ...)
    intensity = tri[0]
    return intensity, (tri[1] - tri[2], tri[3] - tri[4], tri[5] - tri[6])


def cell_table(volume: Array) -> Array:
    """(X*Y*Z, 8) cell table: row (x,y,z) holds the 8 trilinear corner
    values of cell (x,y,z) in ``_CORNERS`` order, highs clamped at the
    boundary (`/root/reference/differender/volume_raycaster.py:170-172`).

    WHY (measured, experiments/exp_slope_profile.py): gather cost on this
    XLA-TPU stack is per-INDEX (~0.12 G idx/s scalar) and a W=8 row gather
    moves 8x the data at ~0.7x the scalar per-index cost — so one
    row-gather per sample replaces 8 scalar corner gathers, cutting the
    march's dominant cost ~8-12x.  8x volume memory (537 MB at 256^3);
    gradients flow through the 8 clamped shifts automatically.
    """
    def hi_shift(v, ax):
        n = v.shape[ax]
        return jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, n, axis=ax),
             jax.lax.slice_in_dim(v, n - 1, n, axis=ax)], axis=ax)

    rows = []
    for bx, by, bz in _CORNERS:
        v = volume
        if bx:
            v = hi_shift(v, 0)
        if by:
            v = hi_shift(v, 1)
        if bz:
            v = hi_shift(v, 2)
        rows.append(v.reshape(-1))
    return jnp.stack(rows, axis=-1)


def _cell_base_fracs(volume_shape, px, py, pz):
    """Flat cell index (lo corner) + per-axis fracs, reference semantics."""
    X, Y, Z = volume_shape

    def axis(p, size):
        scale = np.float32(size - 1.0 - 1e-4)
        v = jnp.clip(0.5 * p + 0.5, 0.0, 1.0) * scale
        lo_f = jnp.floor(v)
        return lo_f.astype(jnp.int32), v - lo_f

    lx, fx = axis(px, X)
    ly, fy = axis(py, Y)
    lz, fz = axis(pz, Z)
    return (lx * Y + ly) * Z + lz, fx, fy, fz


def _corner_weight_factors(fx, fy, fz):
    """Per-axis (8, ...) lerp factors from fracs (corner bit broadcasting)."""
    nd = fx.ndim
    bx, by, bz = (_axis_bits(a, nd) for a in range(3))
    wx = fx[None] * bx + (1.0 - fx)[None] * (1.0 - bx)
    wy = fy[None] * by + (1.0 - fy)[None] * (1.0 - by)
    wz = fz[None] * bz + (1.0 - fz)[None] * (1.0 - bz)
    return wx, wy, wz


def _cell_rows(cell: Array, base: Array) -> Array:
    """Row-gather the cell table at flat indices ``base`` (...,); returns
    corner values (8, ...) (transposed immediately — the (M, 8) gather
    output's tiny minor dim is a TPU tile-padding trap)."""
    vals = jnp.take(cell, base.reshape(-1), axis=0)        # (M, 8)
    return vals.T.reshape((8,) + base.shape)


def sample_cell_analytic(cell: Array, volume_shape, px, py, pz,
                         delta: float = 1e-3):
    """Intensity + analytic in-cell gradient from ONE row gather per sample.
    Same math as :func:`sample_with_gradient_analytic`."""
    X, Y, Z = volume_shape
    base, fx, fy, fz = _cell_base_fracs(volume_shape, px, py, pz)
    vals = _cell_rows(cell, base)                          # (8, ...)
    wx, wy, wz = _corner_weight_factors(fx, fy, fz)
    nd = px.ndim
    dbx, dby, dbz = (2.0 * _axis_bits(a, nd) - 1.0 for a in range(3))
    intensity = jnp.sum(vals * (wx * wy * wz), axis=0)
    sc = [np.float32(delta * (s - 1.0 - 1e-4)) for s in (X, Y, Z)]
    gx = jnp.sum(vals * (dbx * wy * wz), axis=0) * sc[0]
    gy = jnp.sum(vals * (wx * dby * wz), axis=0) * sc[1]
    gz = jnp.sum(vals * (wx * wy * dbz), axis=0) * sc[2]
    return intensity, (gx, gy, gz)


def sample_cell_parity(cell: Array, volume_shape, px, py, pz,
                       delta: float = 1e-3):
    """Full-parity central-difference sampling via the cell table: 7 row
    gathers per sample (one per stencil point) in a single take."""
    nd = px.ndim
    off = _NORMAL_OFFSETS.reshape((7, 3) + (1,) * nd)
    d = np.float32(delta)
    pxs = px[None] + d * off[:, 0]
    pys = py[None] + d * off[:, 1]
    pzs = pz[None] + d * off[:, 2]
    base, fx, fy, fz = _cell_base_fracs(volume_shape, pxs, pys, pzs)
    vals = _cell_rows(cell, base)                          # (8, 7, ...)
    wx, wy, wz = _corner_weight_factors(fx, fy, fz)
    tri = jnp.sum(vals * (wx * wy * wz), axis=0)           # (7, ...)
    return tri[0], (tri[1] - tri[2], tri[3] - tri[4], tri[5] - tri[6])


# ---------------------------------------------------------------------------
# Supercell table: 4x4x4 grid-point rows — multiple trilinear evaluations
# (stencil points or consecutive march samples) share ONE row gather.
# Motivation (experiments/row_scatter_results.jsonl): gather AND scatter on
# this stack are priced per-INDEX with a strong table-size dependence, so
# fetching 64-wide rows that serve several samples beats narrow rows 1:1
# with samples.  Costs 64x the volume in memory — gate by size.
# ---------------------------------------------------------------------------

# lane-offset patterns of the flattened 4x4x4 row (x-major)
_OX4 = (np.arange(64, dtype=np.int32) // 16).astype(np.float32)
_OY4 = ((np.arange(64, dtype=np.int32) // 4) % 4).astype(np.float32)
_OZ4 = (np.arange(64, dtype=np.int32) % 4).astype(np.float32)
_OX4I = _OX4.astype(np.int32)
_OY4I = _OY4.astype(np.int32)
_OZ4I = _OZ4.astype(np.int32)


def supercell_table(volume: Array) -> Array:
    """(X*Y*Z, 64) table: row (x,y,z) holds the 4x4x4 grid-point
    neighborhood ``[x..x+3] x [y..y+3] x [z..z+3]`` (clamped at the upper
    boundary, matching the reference's high-index clamp
    `/root/reference/differender/volume_raycaster.py:170-172`), flattened
    x-major.  64x volume memory."""
    def shift(v, ax, m):
        if m == 0:
            return v
        n = v.shape[ax]
        tail = jax.lax.slice_in_dim(v, n - 1, n, axis=ax)
        reps = jnp.concatenate([tail] * m, axis=ax)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(v, m, n, axis=ax), reps], axis=ax)

    rows = []
    for ox in range(4):
        vx = shift(volume, 0, ox)
        for oy in range(4):
            vy = shift(vx, 1, oy)
            for oz in range(4):
                rows.append(shift(vy, 2, oz).reshape(-1))
    return jnp.stack(rows, axis=-1)


def supercell2_table(volume: Array) -> Array:
    """Stride-2 supercell table: (X/2 * Y/2 * Z/2, 64) rows holding the
    4x4x4 neighborhoods of EVEN base coordinates only — 8x less memory
    than :func:`supercell_table` (volume x8 instead of x64), at the cost
    of quantized bases: a sample footprint fits a row iff its span plus
    the <=2-voxel even-floor slack stays under the row's 3-cell cover.
    The parity stencil (span ``delta*(size-1)`` voxels, ~0.5 at 512^3)
    always fits; step groups are admitted under the tighter bound
    ``(G-1)*step + stencil_diam < 1`` voxel (G=2 at 512^3 / sr=1 —
    :meth:`RenderConfig.supercell_group`).  Use stride-2 where the full
    table exceeds HBM (512^3: 4.3 GB vs 34 GB).

    Requires even X, Y, Z.  Clamped at the upper boundary like
    :func:`supercell_table`.
    """
    X, Y, Z = volume.shape
    assert X % 2 == 0 and Y % 2 == 0 and Z % 2 == 0, (X, Y, Z)

    def sel(v, ax, m):
        """out[i] = v[min(2i + m, n-1)] along ``ax`` — the shift-then-
        stride composed into ONE strided slice (+ tiny edge pad), so no
        full-resolution shifted intermediate is ever materialized (the
        naive form put 64 volume-sized tensors in the graph and crashed
        the remote compiler at 512^3)."""
        n = v.shape[ax]
        want = n // 2
        sl = jax.lax.slice_in_dim(v, m, n, stride=2, axis=ax)
        cur = sl.shape[ax]
        if cur < want:
            tail = jax.lax.slice_in_dim(v, n - 1, n, axis=ax)
            reps = jnp.concatenate([tail] * (want - cur), axis=ax)
            sl = jnp.concatenate([sl, reps], axis=ax)
        elif cur > want:
            sl = jax.lax.slice_in_dim(sl, 0, want, axis=ax)
        return sl

    rows = []
    for ox in range(4):
        vx = sel(volume, 0, ox)
        for oy in range(4):
            vy = sel(vx, 1, oy)
            for oz in range(4):
                rows.append(sel(vy, 2, oz).reshape(-1))
    return jnp.stack(rows, axis=-1)


def _even_floor(v):
    """Largest EVEN integer <= floor(v): the stride-2 table's base
    quantization — must stay bitwise-identical between the forward
    sampler and the sorted VJP's transpose."""
    return 2.0 * jnp.floor(0.5 * jnp.floor(v))


def sample_super2_parity(table: Array, volume_shape, px, py, pz,
                        delta: float = 1e-3, group: int = 1):
    """Full-parity sampling via the stride-2 supercell table: ONE 64-wide
    row gather per sample covering the whole 7-point stencil (vs 7 8-wide
    rows for :func:`sample_cell_parity` — the 512^3 parity lever, where
    the full-stride table does not fit HBM).

    Validity (group 1): ``u = v - 2*floor(vm/2) < 2 + stencil_span`` must
    stay < 3, i.e. ``delta * (size-1) < 1`` — checked by the caller
    (``RenderConfig.resolved_march_table``).  With ``group`` G > 1
    (step-major (K, N) inputs), G consecutive march steps share one row;
    the even-floor slack costs one extra voxel vs the stride-1 bound, so
    the group span must satisfy ``(G-1)*step + stencil_diam < 1`` voxel
    (:meth:`RenderConfig.supercell_group` applies this tighter bound for
    stride-2 tables) — at 512^3 / sampling_rate 1 that admits G=2, i.e.
    HALF the gather indices forward and half the AD scatter rows backward
    relative to the round-3 per-sample stride-2 march.
    Same math/values as :func:`sample_cell_parity`.
    """
    X, Y, Z = volume_shape

    def flat_of(bx, by, bz):
        return (((bx * 0.5) * (Y // 2) + by * 0.5) * (Z // 2)
                + bz * 0.5).astype(jnp.int32)

    return _super_parity_core(table, volume_shape, px, py, pz,
                              np.float32(delta), group, _even_floor,
                              flat_of)


def _hat4(pat: np.ndarray, u: Array) -> Array:
    """(M, 64) linear-interp weights on local coords ``u`` (M, 1) against
    the integer lane pattern ``pat`` (64,): ``max(0, 1 - |u - pat|)``.
    Two nonzero lanes; bit-identical to the floor/frac two-term lerp."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(u - pat[None]))


def _dhat4(pat: np.ndarray, u: Array) -> Array:
    """(M, 64) analytic in-cell derivative weights: ``-1`` at lane
    ``floor(u)``, ``+1`` at ``floor(u)+1`` (floor form — matches
    :func:`sample_cell_analytic`'s ``2*bit - 1`` exactly, including at
    integer coordinates where the hat subgradient would differ)."""
    lo = jnp.floor(u)
    ip = pat[None]
    return jnp.where(ip == lo + 1.0, 1.0, 0.0) - jnp.where(ip == lo, 1.0,
                                                           0.0)


def _super_axis(p: Array, size: int, dshift):
    """Clamped voxel coordinate of ``p`` shifted by ``dshift`` (world)."""
    scale = np.float32(size - 1.0 - 1e-4)
    return jnp.clip(0.5 * (p + dshift) + 0.5, 0.0, 1.0) * scale


def _parity_eval_from_rows(rows, ux0, uxp, uxm, uy0, uyp, uym,
                           uz0, uzp, uzm):
    """7-point stencil evaluation against gathered 64-wide rows.

    Args: rows (M, 64); u* (M, 1) local coords of the center (0) and the
    +/- delta-shifted stencil points per axis.
    Returns (i0, ixp-ixm, iyp-iym, izp-izm), each (M,).
    """
    ax0, axp, axm = (_hat4(_OX4, u) for u in (ux0, uxp, uxm))
    ay0, ayp, aym = (_hat4(_OY4, u) for u in (uy0, uyp, uym))
    az0, azp, azm = (_hat4(_OZ4, u) for u in (uz0, uzp, uzm))

    r0 = rows * (ay0 * az0)
    i0 = jnp.sum(r0 * ax0, axis=-1)
    ixp = jnp.sum(r0 * axp, axis=-1)
    ixm = jnp.sum(r0 * axm, axis=-1)
    q = rows * ax0
    iyp = jnp.sum(q * (ayp * az0), axis=-1)
    iym = jnp.sum(q * (aym * az0), axis=-1)
    izp = jnp.sum(q * (ay0 * azp), axis=-1)
    izm = jnp.sum(q * (ay0 * azm), axis=-1)
    return i0, ixp - ixm, iyp - iym, izp - izm


def sample_super_parity(table: Array, volume_shape, px, py, pz,
                        delta: float = 1e-3, group: int = 1):
    """Full-parity central-difference sampling from ONE 64-wide row gather
    per sample (vs 7 rows for :func:`sample_cell_parity`): the whole
    7-point stencil's corners fit in the 4^3 neighborhood because the
    stencil radius ``delta*(size-1)`` is < 1 voxel.

    With ``group`` G > 1 (requires step-major (K, N) inputs, K % G == 0),
    G consecutive march steps additionally share that one row — the parity
    counterpart of :func:`sample_super_analytic`'s grouping, the round-3
    lever that closes most of the parity/analytic cost gap (G-fold fewer
    gather indices forward AND G-fold fewer scatter rows in the AD
    backward).  Validity bound in :meth:`RenderConfig.supercell_group`
    (the group span now includes the stencil diameter).

    Same math/values as :func:`sample_cell_parity`.
    Returns: intensity (...,), (gx, gy, gz) (...,).
    """
    X, Y, Z = volume_shape

    def flat_of(bx, by, bz):
        return ((bx * Y + by) * Z + bz).astype(jnp.int32)

    return _super_parity_core(table, volume_shape, px, py, pz,
                              np.float32(delta), group, jnp.floor, flat_of)


def _super_parity_core(table, volume_shape, px, py, pz, d, group,
                       base_of, flat_of):
    """Shared gather/eval core of :func:`sample_super_parity` (stride 1)
    and :func:`sample_super2_parity` (stride 2): ``base_of`` maps the
    per-axis minimum stencil coordinate to the row base coordinate,
    ``flat_of`` maps base coordinates to the table's flat row index."""
    X, Y, Z = volume_shape
    sh = px.shape

    if group == 1:
        M = int(np.prod(sh))

        def axis(p, size):
            v0 = _super_axis(p, size, 0.0).reshape(M, 1)
            vp = _super_axis(p, size, d).reshape(M, 1)
            vm = _super_axis(p, size, -d).reshape(M, 1)
            b = base_of(vm)                     # min of the three cells
            return b, v0 - b, vp - b, vm - b    # local coords in [0, 2|3)

        bx, ux0, uxp, uxm = axis(px, X)
        by, uy0, uyp, uym = axis(py, Y)
        bz, uz0, uzp, uzm = axis(pz, Z)
        base = flat_of(bx, by, bz)[:, 0]
        rows = jnp.take(table, base, axis=0)                  # (M, 64)
        i0, gx, gy, gz = _parity_eval_from_rows(
            rows, ux0, uxp, uxm, uy0, uyp, uym, uz0, uzp, uzm)
        return i0.reshape(sh), (gx.reshape(sh), gy.reshape(sh),
                                gz.reshape(sh))

    K, N = sh
    G = group
    assert K % G == 0, (K, G)
    Mg = (K // G) * N

    def axis(p, size):
        v0 = _super_axis(p, size, 0.0).reshape(K // G, G, N)
        vp = _super_axis(p, size, d).reshape(K // G, G, N)
        vm = _super_axis(p, size, -d).reshape(K // G, G, N)
        b = base_of(jnp.min(vm, axis=1))                      # (K/G, N)
        bb = b[:, None]
        return b, v0 - bb, vp - bb, vm - bb     # local coords in [0, 3)

    bx, ux0, uxp, uxm = axis(px, X)
    by, uy0, uyp, uym = axis(py, Y)
    bz, uz0, uzp, uzm = axis(pz, Z)
    base = flat_of(bx, by, bz).reshape(Mg)
    rows = jnp.take(table, base, axis=0)                      # (Mg, 64)

    outs = []
    for m in range(G):
        outs.append(_parity_eval_from_rows(
            rows,
            ux0[:, m].reshape(Mg, 1), uxp[:, m].reshape(Mg, 1),
            uxm[:, m].reshape(Mg, 1),
            uy0[:, m].reshape(Mg, 1), uyp[:, m].reshape(Mg, 1),
            uym[:, m].reshape(Mg, 1),
            uz0[:, m].reshape(Mg, 1), uzp[:, m].reshape(Mg, 1),
            uzm[:, m].reshape(Mg, 1)))

    def regroup(vals):                                        # G x (Mg,)
        stacked = jnp.stack([v.reshape(K // G, N) for v in vals], axis=1)
        return stacked.reshape(K, N)

    return (regroup([o[0] for o in outs]),
            (regroup([o[1] for o in outs]),
             regroup([o[2] for o in outs]),
             regroup([o[3] for o in outs])))


def sample_super_analytic(table: Array, volume_shape, px, py, pz,
                          delta: float = 1e-3, group: int = 1):
    """Intensity + analytic in-cell gradient via the supercell table, with
    ``group`` consecutive march steps sharing ONE row gather (cuts gather
    indices ``group``-fold; validity bound in
    :meth:`RenderConfig.supercell_group` — consecutive samples' cells must
    stay within the row's 3-cell span).

    Args: px/py/pz (K, N) with ``K % group == 0`` (step-major).
    Same math/values as :func:`sample_cell_analytic`.
    """
    X, Y, Z = volume_shape
    K, N = px.shape
    assert K % group == 0, (K, group)
    G = group
    Mg = (K // G) * N
    sc = [np.float32(delta * (s - 1.0 - 1e-4)) for s in (X, Y, Z)]

    def axis(p, size):
        v = _super_axis(p, size, 0.0).reshape(K // G, G, N)
        b = jnp.floor(jnp.min(v, axis=1))                     # (K/G, N)
        return b, v - b[:, None]                              # local [0,3)

    bx, ux = axis(px, X)
    by, uy = axis(py, Y)
    bz, uz = axis(pz, Z)
    base = ((bx * Y + by) * Z + bz).astype(jnp.int32).reshape(Mg)
    rows = jnp.take(table, base, axis=0)                      # (Mg, 64)

    outs = []
    for m in range(G):
        uxm = ux[:, m].reshape(Mg, 1)
        uym = uy[:, m].reshape(Mg, 1)
        uzm = uz[:, m].reshape(Mg, 1)
        axv, dax = _hat4(_OX4, uxm), _dhat4(_OX4, uxm)
        ayv, day = _hat4(_OY4, uym), _dhat4(_OY4, uym)
        azv, daz = _hat4(_OZ4, uzm), _dhat4(_OZ4, uzm)
        r0 = rows * (ayv * azv)
        i0 = jnp.sum(r0 * axv, axis=-1)
        gx = jnp.sum(r0 * dax, axis=-1) * sc[0]
        q = rows * axv
        gy = jnp.sum(q * (day * azv), axis=-1) * sc[1]
        gz = jnp.sum(q * (ayv * daz), axis=-1) * sc[2]
        outs.append((i0, gx, gy, gz))

    def regroup(vals):                                        # G x (Mg,)
        stacked = jnp.stack(vals, axis=1)                     # (K/G, G*? ...)
        return stacked.reshape(K // G, G, N).reshape(K, N)

    intensity = regroup([o[0].reshape(K // G, N) for o in outs])
    gxs = regroup([o[1].reshape(K // G, N) for o in outs])
    gys = regroup([o[2].reshape(K // G, N) for o in outs])
    gzs = regroup([o[3].reshape(K // G, N) for o in outs])
    return intensity, (gxs, gys, gzs)


# ---------------------------------------------------------------------------
# Hand-written march-sampling VJP (SURVEY §7 step 4 / hard part 1): the
# reverse of the Taichi-generated `raycast.grad`'s volume scatter
# (`/root/reference/differender/volume_raycaster.py:460-461`), re-designed
# for TPU scatter pricing.  Measured (experiments/row_scatter_results.jsonl):
# XLA scatter-add into large tables costs ~60-190 ns/row regardless of
# sortedness, but ~7-15 ns/row into cache-resident tables <= ~4 MB.  So the
# backward scatters per IMAGE TILE into a small box-local supercell table
# (samples of one tile x step-block are spatially confined), quad-combining
# each sample group's 8 corner cotangents into ONE 64-wide row, then folds
# the box into d_volume with 64 static shifted adds + one dynamic-slice add.
# No atomics, no big-table scatter; camera cotangents are not produced
# (positions get zero grads — the reference has no camera gradients either).
# ---------------------------------------------------------------------------
from typing import NamedTuple as _NamedTuple


class SampleSpec(_NamedTuple):
    """Hashable statics for :func:`sample_block_tiled`."""

    volume_shape: tuple       # (X, Y, Z)
    delta: float              # normal_delta
    group: int                # samples per supercell row (analytic mode)
    parity: bool              # central-difference (7-point) normals
    n_tiles: int              # image tiles per block (N must be tile-major)
    box: int                  # box edge BV in supercell-base units
    check: bool = False       # runtime containment check: poison a tile's
                              # gradient contribution with NaN when its
                              # sample footprint exceeds the box (see
                              # _tiled_volume_grad) instead of silently
                              # clamping to wrong voxels
    box_rows: int = 1 << 18   # sorted VJP: box extent in table rows (64 MB
                              # at f32x64 — the measured scatter-price cliff)
    window_rows: int = 1 << 17  # sorted VJP: rows per sorted window
    stride2: bool = False     # sorted VJP over the stride-2 table: keys
                              # are even-base indices kappa with
                              # voxel = 2*kappa + lane offset
    camera_grads: bool = False  # sorted VJPs: ALSO produce sample-position
                              # cotangents (d_px/d_py/d_pz -> look_from
                              # grads via the AD chain outside).  Costs one
                              # extra row gather per block backward (the
                              # position VJP re-evaluates the forward
                              # against the saved table); off by default —
                              # the reference never differentiates the
                              # camera (volume_raycaster.py:465,473-476)


def _tiled_volume_grad(spec: SampleSpec, bx, by, bz, d_rows, kg):
    """Scatter supercell-row cotangents into d_volume, tile by tile.

    Args:
        bx/by/bz: (KG, T*P) int32 per-axis supercell base coordinates
            (KG = steps-per-block / group; the trailing axis is TILE-MAJOR:
            tile t owns columns [t*P, (t+1)*P)).
        d_rows: (KG, T*P, 64) cotangents in the 4x4x4 row basis.
        kg: KG (static).
    Returns d_volume (X, Y, Z).

    Per tile: one scatter of KG*P rows into a small ((BVx*BVy*BVz), 64)
    box-local table (<= ~8 MB => ~7-10 ns/row, measured — the whole point;
    default box 32 => 8 MB), a 64-way static shifted-add unfold into a
    (BV+3)^3 voxel box, and one dynamic-slice add into d_volume.  Boxes are
    clamped into the volume; geometry guarantees containment for the
    march's tile/block sizes (and when the volume is smaller than the box,
    the box IS the volume and the tiling degenerates to exact global
    accumulation).  Out-of-box bases (pathological cameras / oversized
    tiles) are CLAMPED — callers must respect the documented validity
    domain (see RenderConfig.march_vjp).  With ``spec.check`` the
    containment claim is verified at runtime: a tile whose
    gradient-carrying base span exceeds the box poisons its own
    contribution with NaN (raising is not possible under jit), so
    violation surfaces as NaN volume grads instead of silently-misplaced
    gradient mass.  Rows with exactly-zero cotangents (steps beyond a
    ray's exit, whose clipped positions clamp toward a box corner) are
    excluded from the span test; a whole-volume box (BV = size-1) always
    contains every remaining span.
    """
    X, Y, Z = spec.volume_shape
    T = spec.n_tiles
    P = bx.shape[1] // T
    # Local box must cover all BASE coordinates of a tile's rows: bases
    # range [0, size-2], so cap at size-1 (the +3 apron may then overhang
    # the volume — safe: lanes referencing voxels >= size carry exactly
    # zero weight by the clamped-cell construction, and are dropped by the
    # window clip below).
    BVx = min(spec.box, max(X - 1, 1))
    BVy = min(spec.box, max(Y - 1, 1))
    BVz = min(spec.box, max(Z - 1, 1))

    bx3 = bx.reshape(kg, T, P)
    by3 = by.reshape(kg, T, P)
    bz3 = bz.reshape(kg, T, P)
    rows3 = d_rows.reshape(kg, T, P, 64)

    def tile_body(t, d_vol):
        tbx = jax.lax.dynamic_slice_in_dim(bx3, t, 1, axis=1)[:, 0]
        tby = jax.lax.dynamic_slice_in_dim(by3, t, 1, axis=1)[:, 0]
        tbz = jax.lax.dynamic_slice_in_dim(bz3, t, 1, axis=1)[:, 0]
        trw = jax.lax.dynamic_slice_in_dim(rows3, t, 1, axis=1)[:, 0]
        trw = trw.reshape(kg * P, 64)
        # Origin so that every base in the tile lands in [0, BV-1]; the
        # +3 voxel apron may overhang the (padded) accumulator.
        ox = jnp.clip(jnp.min(tbx), 0, max(X - BVx, 0))
        oy = jnp.clip(jnp.min(tby), 0, max(Y - BVy, 0))
        oz = jnp.clip(jnp.min(tbz), 0, max(Z - BVz, 0))
        lx = jnp.clip(tbx.reshape(-1) - ox, 0, BVx - 1)
        ly = jnp.clip(tby.reshape(-1) - oy, 0, BVy - 1)
        lz = jnp.clip(tbz.reshape(-1) - oz, 0, BVz - 1)
        li = (lx * BVy + ly) * BVz + lz                    # (kg*P,)
        tbl = jnp.zeros((BVx * BVy * BVz, 64), jnp.float32).at[li].add(trw)
        if spec.check:
            # Span test over rows that CARRY gradient only: steps past a
            # short ray's exit have clipped positions (bases clamp toward
            # a box corner) but exactly-zero cotangents — including them
            # would NaN-poison valid tiles.
            nz = jnp.any(trw != 0.0, axis=-1)              # (kg*P,)
            big = jnp.int32(1 << 30)

            def span(tb):
                flat = tb.reshape(-1)
                lo = jnp.min(jnp.where(nz, flat, big))
                hi = jnp.max(jnp.where(nz, flat, -big))
                return hi - lo                             # <0 if no nz row

            bad = ((span(tbx) >= BVx) | (span(tby) >= BVy)
                   | (span(tbz) >= BVz))
            tbl = tbl * jnp.where(bad, jnp.nan, 1.0)
        tbl = tbl.reshape(BVx, BVy, BVz, 64)
        out = jnp.zeros((BVx + 3, BVy + 3, BVz + 3), jnp.float32)
        for cx in range(4):
            for cy in range(4):
                for cz in range(4):
                    out = out.at[cx:cx + BVx, cy:cy + BVy,
                                 cz:cz + BVz].add(
                        tbl[..., (cx * 4 + cy) * 4 + cz])
        cur = jax.lax.dynamic_slice(d_vol, (ox, oy, oz),
                                    (BVx + 3, BVy + 3, BVz + 3))
        return jax.lax.dynamic_update_slice(d_vol, cur + out, (ox, oy, oz))

    # Accumulate into an apron-padded buffer: rows at bases near the upper
    # boundary have lanes whose nominal voxel b+o exceeds size-1; those
    # lanes carry exactly zero cotangent (clamped-cell construction => zero
    # weight), so the pad rows collect only zeros and are sliced off.
    d_vol0 = jnp.zeros((X + 3, Y + 3, Z + 3), jnp.float32)
    d_pad = jax.lax.fori_loop(0, T, tile_body, d_vol0)
    return d_pad[:X, :Y, :Z]


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sample_block_tiled(spec: SampleSpec, volume, table, px, py, pz):
    """Supercell sampling with the hand-written tiled-scatter VJP.

    Forward = :func:`sample_super_analytic` / :func:`sample_super_parity`
    (``volume`` is unused — the cotangent target only).  Backward returns
    d_volume directly (see :func:`_tiled_volume_grad`) and ZERO cotangents
    for table and positions: no camera gradients on this path (parity with
    the reference, whose Taichi autodiff also never differentiates
    ``compute_entry_exit``).  Callers pass ``table = stop_gradient(
    supercell_table(volume))`` so no AD path through the table remains.
    """
    if spec.parity:
        return sample_super_parity(table, spec.volume_shape, px, py, pz,
                                   spec.delta)
    return sample_super_analytic(table, spec.volume_shape, px, py, pz,
                                 spec.delta, group=spec.group)


def _sample_block_tiled_fwd(spec, volume, table, px, py, pz):
    out = sample_block_tiled(spec, volume, table, px, py, pz)
    return out, (px, py, pz)


def _sample_block_tiled_bwd(spec, res, cot):
    px, py, pz = res
    X, Y, Z = spec.volume_shape
    K, N = px.shape
    # The tiled parity FORWARD is ungrouped (sample_super_parity default
    # group 1), so its transpose must be too; analytic is grouped.
    group = 1 if spec.parity else spec.group
    kg = K // group
    bx, by, bz, d_rows = _super_bwd_rows(
        spec.volume_shape, spec.delta, spec.parity, group, px, py, pz, cot)
    d_volume = _tiled_volume_grad(spec, bx, by, bz,
                                  d_rows.reshape(kg, N, 64), kg)
    zero_tbl = jnp.zeros((X * Y * Z, 64), jnp.float32)
    zp = jnp.zeros_like(px)
    return d_volume, zero_tbl, zp, zp, zp


sample_block_tiled.defvjp(_sample_block_tiled_fwd, _sample_block_tiled_bwd)


# ---------------------------------------------------------------------------
# Sorted-window march VJP (round 4): the tiled VJP's successor for the
# HEADLINE configs, where the tiled design's per-tile fori overhead loses and
# the plain AD scatter pays ~190-208 ns/row into the multi-100MB supercell
# cotangent table (experiments/r4_scatter_results.jsonl: scatter pricing is
# ALLOCATION-bound, with a measured cliff between 64 MB targets, ~14.6
# ns/row, and >=128 MB, ~200 ns/row; sortedness/uniqueness/vmap-boxing do
# NOT help).  Design, assembled pattern measured at 29.4 ns/row end-to-end
# ("r4_full_block_sorted_windows") vs 207.6 for the big-table reference:
#
#   1. sort the block's rows by flat supercell base (1.2-1.8 ns/key) and
#      permute the cotangent rows into that order (~10 ns/row);
#   2. consume the sorted rows with a GLOBAL POINTER over fixed-size row
#      slices: each pass scatters one WR-row slice into a small
#      (box_rows, 64) box anchored at the first unplaced base — below the
#      cliff, so the scatter runs at small-table pricing;
#   3. fold each box straight to VOXEL space (the supercell-table transpose
#      restricted to the box: a hierarchical 4+4+4 static shifted-add over
#      the dz/dy/dx lane axes) and dynamic-slice-add the resulting segment
#      into d_volume — so the scan over march blocks accumulates the CHEAP
#      dense (X,Y,Z) buffer, never a (X*Y*Z, 64) table cotangent.
#
# Exactness for ANY base distribution (unlike the tiled path's documented
# clamping footgun): a pass that cannot place its whole slice (bases span
# past the box) leaves the tail to the next pass, whose anchor advances by
# >= box_rows — so M/WR + ceil(C/box_rows) + 2 passes always complete, with
# out-of-box rows contributing exactly-zero updates at clamped indices.
# Passes after the pointer reaches the end are runtime-skipped (a lax.cond
# that carries only the small folded segment — an earlier design that
# threaded the d_volume accumulator through per-window conds was measured
# to copy it each iteration, ~0.25 s/block, voiding the scatter win).
# ---------------------------------------------------------------------------


def _fold_box_to_segment(box: Array, E: int, Z: int, YZ: int) -> Array:
    """Fold a (E, 64) box-local supercell cotangent table into the flat
    voxel segment it covers.

    Table row ``o + j`` lane ``(dx, dy, dz)`` (lane = dx*16 + dy*4 + dz)
    accumulates into flat voxel ``o + j + dx*YZ + dy*Z + dz`` — the exact
    transpose of :func:`supercell_table`'s row construction.  Returns the
    segment of length ``E + 3*YZ + 3*Z + 3`` starting at the box anchor.
    Hierarchical static shifts keep this at 24 row-adds instead of 64.
    """
    boxT = box.T                                            # (64, E)
    a1 = jnp.zeros((16, E + 3), jnp.float32)
    for dz in range(4):
        a1 = a1.at[:, dz:dz + E].add(boxT[dz::4, :])        # rows dx*4+dy
    w1 = E + 3
    a2 = jnp.zeros((4, w1 + 3 * Z), jnp.float32)
    for dy in range(4):
        a2 = a2.at[:, dy * Z:dy * Z + w1].add(a1[dy::4, :])  # rows dx
    w2 = w1 + 3 * Z
    seg = jnp.zeros((w2 + 3 * YZ,), jnp.float32)
    for dx in range(4):
        seg = seg.at[dx * YZ:dx * YZ + w2].add(a2[dx, :])
    return seg                                              # (E + apron,)


def _fold_box_to_segment2(box: Array, E: int, Z: int, YZ: int):
    """Stride-2 :func:`_fold_box_to_segment`: box row ``j`` lane
    ``(dx, dy, dz)`` accumulates into voxel position
    ``2*j + dx*YZ + dy*Z + dz`` (the box index is the even-base index
    kappa, and voxel = 2*kappa + lane offset).

    Because ``Z`` and ``YZ`` are even, the voxel position's PARITY equals
    the dz lane's parity — so the fold splits into two independent
    stride-1 folds over the even/odd half-lattices (position/2 =
    j + dx*(YZ/2) + dy*(Z/2) + dz//2), avoiding any interleaved tensor
    with a tiny minor dim in the per-pass hot loop (CLAUDE.md rule 3);
    the caller interleaves the two half ACCUMULATORS once per block.
    Returns (seg_even, seg_odd), each of length ``E + 3*(YZ+Z)//2 + 1``.
    """
    boxT = box.T                                            # (64, E)
    Zh, YZh = Z // 2, YZ // 2
    w1 = E + 1
    w2 = w1 + 3 * Zh
    Lh = w2 + 3 * YZh

    def half(dz_pairs):
        a1 = jnp.zeros((16, w1), jnp.float32)
        for dz, dzh in dz_pairs:                            # dzh = dz // 2
            a1 = a1.at[:, dzh:dzh + E].add(boxT[dz::4, :])
        a2 = jnp.zeros((4, w2), jnp.float32)
        for dy in range(4):
            a2 = a2.at[:, dy * Zh:dy * Zh + w1].add(a1[dy::4, :])
        seg = jnp.zeros((Lh,), jnp.float32)
        for dx in range(4):
            seg = seg.at[dx * YZh:dx * YZh + w2].add(a2[dx, :])
        return seg

    return half(((0, 0), (2, 1))), half(((1, 0), (3, 1)))


def sorted_acc_shape(spec: SampleSpec):
    """Shape of the flat sorted-placement accumulator for ``spec``:
    ``(H, acc_len)`` with H=2 half-lattices (even/odd voxel parity) for
    stride-2 specs, H=1 otherwise.  Callers that accumulate several
    blocks' cotangents before a single :func:`sorted_finalize` (the 512^3
    host-level blockwise backward) allocate this once and thread it
    through :func:`sorted_accumulate` as a donated argument."""
    X, Y, Z = spec.volume_shape
    YZ = Y * Z
    C = X * YZ
    Ck = C // 2 if spec.stride2 else C
    E = min(spec.box_rows, Ck)
    if spec.stride2:
        Es = E + 3 * (YZ + Z) // 2 + 1
        return 2, Ck + Es - E
    return 1, C + 3 * YZ + 3 * Z + 3


def sorted_accumulate(spec: SampleSpec, d_flat: Array, base: Array,
                      d_rows: Array) -> Array:
    """Add (M, 64) supercell-row cotangents into the flat accumulator
    ``d_flat`` (shape :func:`sorted_acc_shape`), sorted-window style (see
    the block comment above).

    Args:
        d_flat: (H, acc_len) f32 running accumulator (donate for in-place
            updates across blocks).
        base: (M,) int32 row keys — flat supercell base indices
            ``(bx*Y + by)*Z + bz`` for the stride-1 table, or even-base
            indices ``kappa = (bx/2)*YZ + (by/2)*Z + bz/2`` (so that
            voxel = 2*kappa + lane offset) when ``spec.stride2``.
        d_rows: (M, 64) f32 cotangents in the 4x4x4 row basis.
    Returns the updated accumulator; :func:`sorted_finalize` converts it
    to the (X, Y, Z) voxel lattice.
    """
    X, Y, Z = spec.volume_shape
    YZ = Y * Z
    C = X * YZ
    Ck = C // 2 if spec.stride2 else C         # key range (dead key = Ck)
    M = base.shape[0]
    E = min(spec.box_rows, Ck)                 # box extent in key space
    WR = min(spec.window_rows, M)              # rows per pass slice
    NW = -(-M // WR)                           # full slices
    S = -(-Ck // E)                            # anchor-advance bound
    H, _acc_len = sorted_acc_shape(spec)
    if spec.stride2:
        # Two half-lattice accumulator rows (even/odd voxel parity; see
        # _fold_box_to_segment2) — interleaved ONCE in sorted_finalize.
        Es = E + 3 * (YZ + Z) // 2 + 1         # half segment length

        def fold(box):
            se, so = _fold_box_to_segment2(box, E, Z, YZ)
            return jnp.stack([se, so])
    else:
        Es = E + 3 * YZ + 3 * Z + 3            # folded segment length

        def fold(box):
            return _fold_box_to_segment(box, E, Z, YZ)[None]

    # Dead rows (exactly-zero cotangents: steps past a ray's exit, ERT-
    # gated steps, steps dropped by the composite gate) contribute nothing
    # — give them a past-the-end sort key so they cluster after every live
    # row and the pass loop STOPS at the live count without ever
    # scattering them.  Deep blocks are often mostly dead (measured: the
    # per-block placement cost is dominated by per-spanned-box fixed
    # traffic, and dead clamped-position rows at the volume corners both
    # widen the span and pad every slice).
    alive = jnp.any(d_rows != 0.0, axis=-1)
    key = jnp.where(alive, base, jnp.int32(Ck))
    bs, pidx = jax.lax.sort_key_val(
        key, jnp.arange(M, dtype=jnp.int32))
    rs = jnp.take(d_rows, pidx, axis=0)
    j_end = jnp.sum(alive.astype(jnp.int32))
    MP = NW * WR
    if MP > M:
        # Padding with Ck keeps the key array sorted; the pass loop never
        # reaches the pad (j_end <= M).
        bs = jnp.concatenate(
            [bs, jnp.full((MP - M,), Ck, jnp.int32)])
        rs = jnp.concatenate(
            [rs, jnp.zeros((MP - M, 64), jnp.float32)], axis=0)

    omax = max(Ck - E, 0)
    ridx = jnp.arange(WR, dtype=jnp.int32)
    # Pass bound: every pass with unplaced rows either consumes its whole
    # WR-row slice (<= NW + 2 such passes incl. the clamped tail) or
    # consumes every row below anchor + E, advancing the NEXT anchor by
    # >= E (<= ceil(C/E) = S such passes).  Strict progress is guaranteed
    # because the anchor row itself always fits its own box.
    T = NW + S + 2

    def pass_body(_i, carry):
        d_flat, j = carry

        def active(j):
            # Slice the next WR sorted rows; near the end the slice is
            # clamped and re-covers placed rows — masked out by gidx >= j.
            jc = jnp.minimum(j, MP - WR)
            wb = jax.lax.dynamic_slice_in_dim(bs, jc, WR)
            wr = jax.lax.dynamic_slice_in_dim(rs, jc, WR, axis=0)
            # Anchor at the first unplaced row's base (sorted => the
            # placed set is always the leading j rows).
            o = jnp.clip(jax.lax.dynamic_index_in_dim(
                wb, j - jc, keepdims=False), 0, omax)
            li = wb - o
            gidx = jc + ridx
            fit = (li >= 0) & (li < E) & (gidx >= j)
            box = jnp.zeros((E, 64), jnp.float32).at[
                jnp.clip(li, 0, E - 1)].add(
                jnp.where(fit[:, None], wr, 0.0))
            seg = fold(box)
            # All slice rows below anchor + E are now placed; rows beyond
            # the slice can only be below it when the slice fully fits
            # (count == WR), in which case jc + WR is still a valid
            # (conservative) frontier.
            j_new = jc + jnp.sum((wb < o + E).astype(jnp.int32))
            return seg, o, jnp.maximum(j, j_new)

        def skip(j):
            return jnp.zeros((H, Es), jnp.float32), jnp.int32(0), j

        # The cond carries only the small folded segment — never d_flat
        # (threading the 64 MB accumulator through a cond was measured to
        # copy it per iteration and void the scatter win).
        seg, o, j = jax.lax.cond(j >= j_end, skip, active, j)
        cur = jax.lax.dynamic_slice(d_flat, (0, o), (H, Es))
        d_flat = jax.lax.dynamic_update_slice(d_flat, cur + seg, (0, o))
        return d_flat, j

    d_flat, _j = jax.lax.fori_loop(0, T, pass_body, (d_flat, jnp.int32(0)))
    # The apron rows collect only exactly-zero lanes (clamped-cell
    # construction gives zero weight to voxels >= size), same argument as
    # the tiled path's padded accumulator.
    return d_flat


def _interleave_mxu(even: Array, odd: Array, X: int, Y: int, Z: int):
    """Interleave flat even/odd half-lattices to (X, Y, Z) on the MXU.

    ``out[xy, 2k] = even[xy, k]``, ``out[xy, 2k+1] = odd[xy, k]`` via two
    0/1 permutation matmuls ``even2 @ Pe + odd2 @ Po`` with ``Pe[k, 2k] =
    Po[k, 2k+1] = 1``.  Exactness: every output element is ``1.0 * value``
    plus terms that are exactly ``0.0 * other``, and adding exact zeros is
    exact in f32, so with ``Precision.HIGHEST`` (CLAUDE.md rule 7 — the
    default MXU bf16 rounding would corrupt values) the result is bitwise
    equal to the scatter/pad forms (tested against the pad form in
    tests/test_sampling.py).  The permutation matrices are numpy
    constants (rule 2), (Z/2, Z) f32 = 0.5 MB at Z=512."""
    Zh = Z // 2
    pe = np.zeros((Zh, Z), np.float32)
    po = np.zeros((Zh, Z), np.float32)
    pe[np.arange(Zh), 2 * np.arange(Zh)] = 1.0
    po[np.arange(Zh), 2 * np.arange(Zh) + 1] = 1.0
    e2 = even.reshape(X * Y, Zh)
    o2 = odd.reshape(X * Y, Zh)
    hi = jax.lax.Precision.HIGHEST
    out = (jnp.dot(e2, pe, precision=hi) + jnp.dot(o2, po, precision=hi))
    return out.reshape(X, Y, Z)


def sorted_finalize(spec: SampleSpec, d_flat: Array) -> Array:
    """Convert the flat sorted-placement accumulator to d_volume
    (X, Y, Z)."""
    X, Y, Z = spec.volume_shape
    C = X * Y * Z
    if spec.stride2:
        # Interleave the even/odd half-lattices: flat voxel 2i <- even[i],
        # 2i+1 <- odd[i] (flat-index parity == z parity; Z is even).
        # NEVER via a (Ck, 2) stack: a tensor with minor dim 2 tile-pads
        # up to 64x on TPU (CLAUDE.md rule 3) — at 512^3 that padded
        # intermediate alone (~34 GB) crashed the remote compile helper.
        Ck = C // 2
        if C >= (1 << 27):
            # 512^3-class: even the interior-dilated-pad form hangs the
            # remote compiler when the full lattice is a program OUTPUT
            # (r5_blockwise512: place_finalize/pad2d and the 1-D pad both
            # stall >7 min).  The strided-scatter form compiles (1.9 s)
            # but executes at scatter pricing — 2.36 s measured
            # (r10_bw512_mem) — so the interleave rides the MXU instead:
            # out[xy, 2k+p] = half_p[xy, k] as two 0/1 permutation
            # matmuls.  Each output element is 1.0*value plus exact
            # zeros, so f32 HIGHEST is bitwise-exact; ~69 G MACs is
            # milliseconds on the MXU.
            return _interleave_mxu(d_flat[0, :Ck], d_flat[1, :Ck],
                                   X, Y, Z)
        # Small volumes: two interior-dilated pads + add — pure bandwidth,
        # no index generation; measurably cheaper than the two scatter
        # HLOs (~55 ms flat each on this stack) at headline 256^3 scale.
        Zh = Z // 2
        e2 = d_flat[0, :Ck].reshape(X * Y, Zh)
        o2 = d_flat[1, :Ck].reshape(X * Y, Zh)
        zero = jnp.float32(0.0)
        out = (jax.lax.pad(e2, zero, ((0, 0, 0), (0, 1, 1)))
               + jax.lax.pad(o2, zero, ((0, 0, 0), (1, 0, 1))))
        return out.reshape(X, Y, Z)
    return d_flat[0, :C].reshape(X, Y, Z)


def _sorted_volume_grad(spec: SampleSpec, base: Array, d_rows: Array):
    """Place (M, 64) supercell-row cotangents into d_volume in ONE
    function: :func:`sorted_accumulate` into a fresh flat accumulator,
    then :func:`sorted_finalize`.  Single-program callers (the monolithic
    sorted VJPs) use this; the 512^3 host-level blockwise backward calls
    the two halves in separate jit programs and keeps the accumulator in
    half-lattice form ACROSS blocks, so no per-block program ever holds
    the full (X, Y, Z) lattice alongside the placement intermediates."""
    d_flat = jnp.zeros(sorted_acc_shape(spec), jnp.float32)
    return sorted_finalize(spec, sorted_accumulate(spec, d_flat, base,
                                                   d_rows))


def _super_bwd_rows(volume_shape, delta: float, parity: bool, group: int,
                    px, py, pz, cot, base_of=jnp.floor):
    """Cotangent rows + bases of grouped supercell sampling.

    The manual transpose of :func:`sample_super_parity` /
    :func:`sample_super_analytic` with step-group ``group`` (the march is
    linear in the gathered rows, so only hat weights and cotangents are
    needed).  The single shared transpose behind BOTH hand-written VJPs:
    the tiled backward passes ``group=1`` in parity mode (its parity
    forward is ungrouped) and its configured group in analytic mode; the
    sorted backward is grouped in both.  ``base_of`` is the forward's
    base mapping (floor for stride 1; even-floor for the stride-2
    table).  Returns
    (bx, by, bz (kg, N) int32 supercell bases, d_rows (Mg, 64) f32).
    """
    X, Y, Z = volume_shape
    K, N = px.shape
    G = group
    assert K % G == 0, (K, G)
    kg = K // G
    Mg = kg * N
    d = np.float32(delta)
    d_int, (d_gx, d_gy, d_gz) = cot

    if parity:
        def axis(p, size):
            v0 = _super_axis(p, size, 0.0).reshape(kg, G, N)
            vp = _super_axis(p, size, d).reshape(kg, G, N)
            vm = _super_axis(p, size, -d).reshape(kg, G, N)
            b = base_of(jnp.min(vm, axis=1))                  # (kg, N)
            bb = b[:, None]
            return b, v0 - bb, vp - bb, vm - bb

        bx, ux0, uxp, uxm = axis(px, X)
        by, uy0, uyp, uym = axis(py, Y)
        bz, uz0, uzp, uzm = axis(pz, Z)
        ci = d_int.reshape(kg, G, N)
        cgx = d_gx.reshape(kg, G, N)
        cgy = d_gy.reshape(kg, G, N)
        cgz = d_gz.reshape(kg, G, N)
        d_rows = jnp.zeros((Mg, 64), jnp.float32)
        for m in range(G):
            sel = (lambda a: a[:, m].reshape(Mg, 1))
            ax0, axp, axm = (_hat4(_OX4, sel(u))
                             for u in (ux0, uxp, uxm))
            ay0, ayp, aym = (_hat4(_OY4, sel(u))
                             for u in (uy0, uyp, uym))
            az0, azp, azm = (_hat4(_OZ4, sel(u))
                             for u in (uz0, uzp, uzm))
            cim, cxm, cym, czm = (sel(c) for c in (ci, cgx, cgy, cgz))
            d_rows = d_rows + (
                (ay0 * az0) * (cim * ax0 + cxm * (axp - axm))
                + ax0 * (az0 * (cym * (ayp - aym))
                         + ay0 * (czm * (azp - azm))))
    else:
        sc = [np.float32(delta * (s - 1.0 - 1e-4)) for s in (X, Y, Z)]

        def axis(p, size):
            v = _super_axis(p, size, 0.0).reshape(kg, G, N)
            b = jnp.floor(jnp.min(v, axis=1))
            return b, v - b[:, None]

        bx, ux = axis(px, X)
        by, uy = axis(py, Y)
        bz, uz = axis(pz, Z)
        ci = d_int.reshape(kg, G, N)
        cgx = d_gx.reshape(kg, G, N) * sc[0]
        cgy = d_gy.reshape(kg, G, N) * sc[1]
        cgz = d_gz.reshape(kg, G, N) * sc[2]
        d_rows = jnp.zeros((Mg, 64), jnp.float32)
        for m in range(G):
            uxm = ux[:, m].reshape(Mg, 1)
            uym = uy[:, m].reshape(Mg, 1)
            uzm = uz[:, m].reshape(Mg, 1)
            axv, dax = _hat4(_OX4, uxm), _dhat4(_OX4, uxm)
            ayv, day = _hat4(_OY4, uym), _dhat4(_OY4, uym)
            azv, daz = _hat4(_OZ4, uzm), _dhat4(_OZ4, uzm)
            cim = ci[:, m].reshape(Mg, 1)
            cxm = cgx[:, m].reshape(Mg, 1)
            cym = cgy[:, m].reshape(Mg, 1)
            czm = cgz[:, m].reshape(Mg, 1)
            d_rows = d_rows + ((ayv * azv) * (cim * axv + cxm * dax)
                               + axv * (azv * (cym * day)
                                        + ayv * (czm * daz)))

    return (bx.astype(jnp.int32), by.astype(jnp.int32),
            bz.astype(jnp.int32), d_rows)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sample_block_sorted(spec: SampleSpec, volume, table, px, py, pz):
    """Supercell sampling with the sorted-window volume-grad VJP.

    Forward = :func:`sample_super_parity` / :func:`sample_super_analytic`
    (grouped in BOTH modes — unlike :func:`sample_block_tiled`, whose
    parity forward is ungrouped); ``volume`` is the cotangent target only.
    Backward places d_volume via :func:`_sorted_volume_grad`.  The table
    cotangent is always zero; sample-position cotangents are zero by
    default (parity with the reference, which never differentiates
    ``compute_entry_exit``) and EXACT when ``spec.camera_grads`` — see
    :func:`_position_cotangents`.  Callers pass ``table = stop_gradient(
    supercell_table(volume))``.
    """
    if spec.parity:
        return sample_super_parity(table, spec.volume_shape, px, py, pz,
                                   spec.delta, group=spec.group)
    return sample_super_analytic(table, spec.volume_shape, px, py, pz,
                                 spec.delta, group=spec.group)


def _position_cotangents(spec: SampleSpec, table, px, py, pz, cot):
    """Sample-position cotangents of the supercell forward eval.

    Differentiates the SAME forward the sorted VJPs run (table
    stop-gradient'd, so no table transpose/scatter is built) — the
    position derivative therefore agrees with the march_vjp='ad' path
    bit-for-bit, including _hat4's subgradient convention.  Re-issues the
    block's row gather once (the price of camera grads; the volume-grad
    path still re-issues NO gathers)."""
    tbl = jax.lax.stop_gradient(table)
    if spec.stride2:
        fwd = sample_super2_parity
    elif spec.parity:
        fwd = sample_super_parity
    else:
        fwd = sample_super_analytic
    _, pos_vjp = jax.vjp(
        lambda a, b, c: fwd(tbl, spec.volume_shape, a, b, c,
                            spec.delta, group=spec.group), px, py, pz)
    return pos_vjp(cot)


def _sample_block_sorted_fwd(spec, volume, table, px, py, pz):
    out = sample_block_sorted(spec, volume, table, px, py, pz)
    res = (table, px, py, pz) if spec.camera_grads else (px, py, pz)
    return out, res


def _sample_block_sorted_bwd(spec, res, cot):
    if spec.camera_grads:
        table, px, py, pz = res
    else:
        table, (px, py, pz) = None, res
    X, Y, Z = spec.volume_shape
    bx, by, bz, d_rows = _super_bwd_rows(
        spec.volume_shape, spec.delta, spec.parity, spec.group,
        px, py, pz, cot)
    base = ((bx * Y + by) * Z + bz).reshape(d_rows.shape[0])
    d_volume = _sorted_volume_grad(spec, base, d_rows)
    zero_tbl = jnp.zeros((X * Y * Z, 64), jnp.float32)
    if spec.camera_grads:
        d_px, d_py, d_pz = _position_cotangents(spec, table, px, py, pz,
                                                cot)
        return d_volume, zero_tbl, d_px, d_py, d_pz
    zp = jnp.zeros_like(px)
    return d_volume, zero_tbl, zp, zp, zp


sample_block_sorted.defvjp(_sample_block_sorted_fwd, _sample_block_sorted_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sample_block_sorted2(spec: SampleSpec, volume, table, px, py, pz):
    """Stride-2 :func:`sample_block_sorted`: forward =
    :func:`sample_super2_parity` (grouped), backward = the sorted-window
    placement keyed by even-base indices (``spec.stride2`` fold).  This is
    the large-volume (512^3-class) march VJP, where the AD path scatters
    into a multi-GB stride-2 table cotangent."""
    return sample_super2_parity(table, spec.volume_shape, px, py, pz,
                                spec.delta, group=spec.group)


def _sample_block_sorted2_fwd(spec, volume, table, px, py, pz):
    out = sample_block_sorted2(spec, volume, table, px, py, pz)
    res = (table, px, py, pz) if spec.camera_grads else (px, py, pz)
    return out, res


def _sample_block_sorted2_bwd(spec, res, cot):
    if spec.camera_grads:
        table, px, py, pz = res
    else:
        table, (px, py, pz) = None, res
    X, Y, Z = spec.volume_shape
    bx, by, bz, d_rows = _super_bwd_rows(
        spec.volume_shape, spec.delta, True, spec.group,
        px, py, pz, cot, base_of=_even_floor)
    # Even-base key: voxel = 2*kappa + lane offset (see _sorted_volume_grad)
    kappa = ((bx // 2) * (Y * Z) + (by // 2) * Z
             + bz // 2).reshape(d_rows.shape[0])
    d_volume = _sorted_volume_grad(spec, kappa, d_rows)
    zero_tbl = jnp.zeros((X * Y * Z // 8, 64), jnp.float32)
    if spec.camera_grads:
        d_px, d_py, d_pz = _position_cotangents(spec, table, px, py, pz,
                                                cot)
        return d_volume, zero_tbl, d_px, d_py, d_pz
    zp = jnp.zeros_like(px)
    return d_volume, zero_tbl, zp, zp, zp


sample_block_sorted2.defvjp(_sample_block_sorted2_fwd,
                            _sample_block_sorted2_bwd)


def sorted_fold_cot(spec: SampleSpec, px, py, pz, cot_stack):
    """The hat-weight FOLD of the sorted-window VJP as a standalone entry
    point: per-sample cotangents -> (base keys, 64-lane cotangent rows).

    ``cot_stack`` is the (4, K, N) stack (d_intensity, d_gx, d_gy, d_gz)
    emitted by :func:`sample_block_defer`'s backward.  Positions are the
    same (K, N) march positions the forward sampled — recomputable from
    the ray SoA, so a caller can run this in its OWN jit program with no
    march table and no gathers (the fold needs only hat weights).
    """
    cot = (cot_stack[0], (cot_stack[1], cot_stack[2], cot_stack[3]))
    X, Y, Z = spec.volume_shape
    if spec.stride2:
        bx, by, bz, d_rows = _super_bwd_rows(
            spec.volume_shape, spec.delta, True, spec.group,
            px, py, pz, cot, base_of=_even_floor)
        base = ((bx // 2) * (Y * Z) + (by // 2) * Z
                + bz // 2).reshape(d_rows.shape[0])
    else:
        bx, by, bz, d_rows = _super_bwd_rows(
            spec.volume_shape, spec.delta, spec.parity, spec.group,
            px, py, pz, cot)
        base = ((bx * Y + by) * Z + bz).reshape(d_rows.shape[0])
    return base, d_rows


def sorted_place_cot(spec: SampleSpec, px, py, pz, cot_stack):
    """Per-sample cotangents -> d_volume: :func:`sorted_fold_cot` followed
    by the sorted-window placement (:func:`_sorted_volume_grad`).

    Kept as one function for callers that fit in one program; the 512^3
    split backward runs the two halves as SEPARATE jit programs — the
    fold's (Mg, 64) hat-weight intermediates and the placement's (X, Y, Z)
    accumulator each exhaust most of the remote compile helper's buffer
    budget on their own (r6_bisect512: a fused fold+place program fails
    where :func:`_sorted_volume_grad` alone compiled at BIGGER row counts,
    experiments/r5_sorted512_results.jsonl place512 row).
    """
    base, d_rows = sorted_fold_cot(spec, px, py, pz, cot_stack)
    return _sorted_volume_grad(spec, base, d_rows)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sample_block_defer(spec: SampleSpec, cot_sink, table, px, py, pz):
    """Supercell sampling whose VJP DEFERS volume-grad placement.

    Forward is identical to :func:`sample_block_sorted` /
    :func:`sample_block_sorted2` (``spec.stride2`` selects the table
    flavor).  The backward, instead of running the sorted-window placement
    in the same program, routes the raw per-sample cotangents out through
    ``cot_sink`` — a (4,) + px.shape f32 array that is unused in the
    forward and exists only as a cotangent mailbox.  The caller
    differentiates w.r.t. ``cot_sink``, receives the (4, K, N) stack, and
    feeds it to :func:`sorted_place_cot` in a separate jit program.
    Table and position cotangents are zero (same no-camera-grads contract
    as the sorted VJPs).
    """
    if spec.stride2:
        return sample_super2_parity(table, spec.volume_shape, px, py, pz,
                                    spec.delta, group=spec.group)
    if spec.parity:
        return sample_super_parity(table, spec.volume_shape, px, py, pz,
                                   spec.delta, group=spec.group)
    return sample_super_analytic(table, spec.volume_shape, px, py, pz,
                                 spec.delta, group=spec.group)


def _sample_block_defer_fwd(spec, cot_sink, table, px, py, pz):
    out = sample_block_defer(spec, cot_sink, table, px, py, pz)
    return out, (cot_sink.shape, table.shape, px.shape)


def _sample_block_defer_bwd(spec, res, cot):
    sink_shape, tbl_shape, p_shape = res
    d_int, (d_gx, d_gy, d_gz) = cot
    d_sink = jnp.stack([d_int, d_gx, d_gy, d_gz]).reshape(sink_shape)
    zero_tbl = jnp.zeros(tbl_shape, jnp.float32)
    zp = jnp.zeros(p_shape, jnp.float32)
    return d_sink, zero_tbl, zp, zp, zp


sample_block_defer.defvjp(_sample_block_defer_fwd, _sample_block_defer_bwd)


def apply_tf_hat_soa(tf: Array, intensity: Array):
    """Gather-free TF lerp, SoA channels: the unrolled hat-basis expansion
    ``sum_i max(0, 1 - |t - i|) * tf[i]`` with ``t = clip(x*(R-1), 0, R-1)``.

    Bit-identical to :func:`apply_tf` (at most two nonzero hat weights;
    adding exact zeros preserves the two-term lerp), with ZERO gather HLOs —
    R * ~7 fused VPU ops per sample, which at R=128 beats the per-index
    gather cost ~5x (see experiments/).  Use for R <= 256; fall back to
    :func:`apply_tf_soa` for larger textures.
    Returns (r, g, b, a) each shaped like ``intensity``.
    """
    R = tf.shape[0]
    t = jnp.clip(intensity * (R - 1.0), 0.0, R - 1.0)
    accs = [None] * 4
    for i in range(R):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(t - np.float32(i)))
        for c in range(4):
            term = w * tf[i, c]
            accs[c] = term if accs[c] is None else accs[c] + term
    return tuple(accs)


def tf_table8(tf: Array) -> Array:
    """Precombined (R*8,) low/high TF table: row i = [tf[i], tf[min(i+1,R-1)]].
    Lets :func:`apply_tf_soa` do the linear TF lerp with ONE gather."""
    hi = jnp.concatenate([tf[1:], tf[-1:]], axis=0)
    return jnp.concatenate([tf, hi], axis=1).reshape(-1)


_ARANGE8 = np.arange(8, dtype=np.int32)


def apply_tf_soa(tf8: Array, intensity: Array):
    """TF lookup with SoA output channels; bit-identical to :func:`apply_tf`.

    Args:
        tf8: (R*8,) table from :func:`tf_table8`.
        intensity: (...,) scalars.
    Returns: (r, g, b, a) each (...,).
    """
    R = tf8.shape[0] // 8   # runtime texture size (NOT config.tf_resolution:
                            # callers may pass differently-sized textures)
    t = jnp.maximum(intensity * (R - 1.0), 0.0)
    lo_f = jnp.floor(t)
    frac = t - lo_f
    lo = jnp.minimum(lo_f.astype(jnp.int32), R - 1)
    lanes = _ARANGE8.reshape((8,) + (1,) * intensity.ndim)
    idx = lo[None] * 8 + lanes                             # (8, ...)
    v = jnp.take(tf8, idx.reshape(-1), axis=0).reshape(idx.shape)
    omf = 1.0 - frac
    return (v[0] * omf + v[4] * frac,
            v[1] * omf + v[5] * frac,
            v[2] * omf + v[6] * frac,
            v[3] * omf + v[7] * frac)


def apply_tf_hat(tf: Array, intensity: Array) -> Array:
    """Gather-free TF lookup: linear interpolation written in the hat basis,
    ``out = sum_i max(0, 1 - |t - i|) * tf[i]`` with ``t = clip(x*(R-1))``.

    Bit-equivalent to :func:`apply_tf` for in-range intensities, with no
    gather HLO — a ``fori_loop`` of R cheap VPU steps.  Used where a gather
    per call-site is too expensive (e.g. per-slab lookups in the shear-warp
    fast path; every gather op costs ~55 ms on the current TPU stack).
    """
    R = tf.shape[0]
    t = jnp.clip(intensity * (R - 1.0), 0.0, R - 1.0)

    if R <= 256:
        # Unrolled: one fused expression — a fori_loop would round-trip the
        # (..., 4) accumulator through HBM R times (dominant cost when
        # called per slab in the shear-warp path).
        acc = None
        for i in range(R):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(t - float(i)))[..., None]
            term = w * tf[i]
            acc = term if acc is None else acc + term
        return acc

    def body(i, acc):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(t - i.astype(jnp.float32)))
        return acc + w[..., None] * tf[i]

    acc0 = jnp.zeros(intensity.shape + (4,), jnp.float32)
    return jax.lax.fori_loop(0, R, body, acc0)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _apply_tf_dot_p(precision, tf, intensity):
    R = tf.shape[0]
    t = jnp.clip(intensity * (R - 1.0), 0.0, R - 1.0)
    shape = t.shape
    tcol = t.reshape(-1, 1)
    idx = np.arange(R, dtype=np.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(tcol - idx))      # (M, R)
    out = jnp.dot(w, tf, precision=precision,
                  preferred_element_type=jnp.float32)
    return out.reshape(shape + (4,))


def _apply_tf_dot_fwd(precision, tf, intensity):
    return _apply_tf_dot_p(precision, tf, intensity), (tf, intensity)


def _apply_tf_dot_bwd(precision, res, g):
    """Hand-written VJP: both cotangents as MXU dots against rebuilt
    weights — no (M, R) cotangent-weight materialization (the AD form
    computes ``dW = g @ tf^T`` then sign/mask/reduce elementwise passes).

    AD-equivalent by case analysis: at interior non-integer t the hat has
    two active lanes => d_t = g . (tf[lo+1] - tf[lo]); at integer t
    (including the clip boundaries t=0 / t=R-1 reached by clamping) the
    max(0, .) picks the zero branch on the +-1 lanes and sign(0)=0 on the
    center lane => d_t = 0, reproduced by the ``frac > 0`` mask (and
    tfd[R-1] = 0 for the upper boundary).
    """
    tf, intensity = res
    R = tf.shape[0]
    t = jnp.clip(intensity * (R - 1.0), 0.0, R - 1.0)
    tcol = t.reshape(-1, 1)
    gm = g.reshape(-1, 4)
    idx = np.arange(R, dtype=np.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(tcol - idx))      # (M, R)
    d_tf = jnp.einsum("mr,mc->rc", w, gm,
                      precision=precision,
                      preferred_element_type=jnp.float32)
    lo = jnp.floor(tcol)
    frac = tcol - lo
    tfd = jnp.concatenate([tf[1:] - tf[:-1],
                           jnp.zeros((1, 4), tf.dtype)], axis=0)
    box = jnp.where(lo == idx, 1.0, 0.0)                 # (M, R)
    dvec = jnp.dot(box, tfd, precision=precision,
                   preferred_element_type=jnp.float32)   # (M, 4)
    d_t = jnp.sum(dvec * gm, axis=-1, keepdims=True)
    d_t = jnp.where(frac > 0.0, d_t, 0.0)
    d_int = (d_t[:, 0] * np.float32(R - 1.0)).reshape(intensity.shape)
    return d_tf, d_int


_apply_tf_dot_p.defvjp(_apply_tf_dot_fwd, _apply_tf_dot_bwd)


_TF_BIN = 8   # texels per coarse bin of the two-level classify


def _tf_bins(tf: Array):
    """(Q, B+1, 4) per-bin texel table with one-texel overlap: bin q holds
    texels ``[B*q, B*q + B]`` (the overlap row is the next bin's first
    texel; the last bin repeats ``tf[R-1]`` — unreachable, u < B there)."""
    R = tf.shape[0]
    B = _TF_BIN
    Q = R // B
    blocks = tf.reshape(Q, B, 4)
    nxt = jnp.concatenate([blocks[1:, :1], tf[None, None, R - 1]], axis=0)
    return jnp.concatenate([blocks, nxt], axis=1)        # (Q, B+1, 4)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _apply_tf_dot2_p(precision, tf, intensity):
    """Two-level TF classify: O(sqrt(R))-ish work per sample.

    The single-level dot builds an (M, R) hat-weight matrix — R * ~5 VPU
    ops per sample, which profiling shows is the COMPUTE bound of the
    shear-warp classify stage (not HBM traffic; a Pallas port of the same
    algorithm would not be faster).  Split the lookup hierarchically:
    a (M, Q) one-hot of the coarse bin q = floor(t/B) picks a (B+1)*4-wide
    row of the overlapped bin table on the MXU, then a (B+1)-lane hat over
    the in-bin coordinate finishes the lerp on the VPU — per-sample work
    drops from ~5R to ~2Q + ~8(B+1) ops (R=128: ~640 -> ~140).

    Value-identical to :func:`apply_tf` at HIGHEST precision: the one-hot
    row copies the bin table exactly, and the hat has the same two active
    lanes/weights as the flat form (all other lanes contribute exact
    zeros).
    """
    R = tf.shape[0]
    B = _TF_BIN
    Q = R // B
    t = jnp.clip(intensity * (R - 1.0), 0.0, R - 1.0)
    shape = t.shape
    tcol = t.reshape(-1, 1)                              # (M, 1)
    q = jnp.minimum(jnp.floor(tcol / B), Q - 1.0)
    u = tcol - B * q                                     # in-bin in [0, B)
    qidx = np.arange(Q, dtype=np.float32)
    w1 = jnp.where(q == qidx, 1.0, 0.0)                  # (M, Q) one-hot
    t2 = _tf_bins(tf).reshape(Q, (B + 1) * 4)
    bins = jnp.dot(w1, t2, precision=precision,
                   preferred_element_type=jnp.float32)   # (M, (B+1)*4)
    ridx = np.arange(B + 1, dtype=np.float32)
    w2 = jnp.maximum(0.0, 1.0 - jnp.abs(u - ridx))       # (M, B+1)
    out = jnp.sum(bins.reshape(-1, B + 1, 4) * w2[..., None], axis=1)
    return out.reshape(shape + (4,))


def _apply_tf_dot2_fwd(precision, tf, intensity):
    return _apply_tf_dot2_p(precision, tf, intensity), (tf, intensity)


def _apply_tf_dot2_bwd(precision, res, g):
    """Both cotangents through the two-level structure (cf.
    ``_apply_tf_dot_bwd`` for the case analysis — identical masking
    semantics: d_t = 0 at integer/clipped t)."""
    tf, intensity = res
    R = tf.shape[0]
    B = _TF_BIN
    Q = R // B
    t = jnp.clip(intensity * (R - 1.0), 0.0, R - 1.0)
    tcol = t.reshape(-1, 1)
    gm = g.reshape(-1, 4)
    q = jnp.minimum(jnp.floor(tcol / B), Q - 1.0)
    u = tcol - B * q
    qidx = np.arange(Q, dtype=np.float32)
    w1 = jnp.where(q == qidx, 1.0, 0.0)                  # (M, Q)
    ridx = np.arange(B + 1, dtype=np.float32)
    w2 = jnp.maximum(0.0, 1.0 - jnp.abs(u - ridx))       # (M, B+1)

    # d_tf: U[m, r, c] = w2[m, r] * g[m, c]; d_T2 = w1^T @ U (MXU);
    # fold the overlap column back onto the next bin's first texel.
    U = (w2[..., None] * gm[:, None, :]).reshape(-1, (B + 1) * 4)
    d_t2 = jnp.dot(w1.T, U, precision=precision,
                   preferred_element_type=jnp.float32)   # (Q, (B+1)*4)
    d_t2 = d_t2.reshape(Q, B + 1, 4)
    d_tf = d_t2[:, :B].reshape(R, 4)
    overlap = d_t2[:, B]                                 # (Q, 4)
    d_tf = d_tf.at[B::B].add(overlap[:-1])
    d_tf = d_tf.at[R - 1].add(overlap[-1])

    # d_intensity: hat derivative -> difference of the two straddled
    # texels, already present in the gathered bin row.
    lo = jnp.floor(u)
    frac = u - lo
    t2 = _tf_bins(tf).reshape(Q, (B + 1) * 4)
    bins = jnp.dot(w1, t2, precision=precision,
                   preferred_element_type=jnp.float32).reshape(-1, B + 1, 4)
    sel = (jnp.where(lo + 1.0 == ridx, 1.0, 0.0)
           - jnp.where(lo == ridx, 1.0, 0.0))            # (M, B+1)
    dvec = jnp.sum(bins * sel[..., None], axis=1)        # (M, 4)
    d_t = jnp.sum(dvec * gm, axis=-1, keepdims=True)
    d_t = jnp.where(frac > 0.0, d_t, 0.0)
    d_int = (d_t[:, 0] * np.float32(R - 1.0)).reshape(intensity.shape)
    return d_tf, d_int


_apply_tf_dot2_p.defvjp(_apply_tf_dot2_fwd, _apply_tf_dot2_bwd)


def apply_tf_dot(tf: Array, intensity: Array,
                 precision=jax.lax.Precision.HIGHEST) -> Array:
    """TF lerp as an MXU dot: hat weights ``W (N, R)`` built with 4 fused
    VPU ops per element, then ``W @ tf`` on the MXU.

    At ``precision=HIGHEST`` this is value-identical to :func:`apply_tf`
    for in-range intensities (at most two nonzero hat weights; f32 dot
    accumulation of exact zeros preserves the two-term lerp).  Lower
    precisions round the hat weights/texels to bf16 passes (weight error
    <= 2^-9) — a speed knob for the approximate shear-warp path, whose
    slab quadrature error dominates that rounding.  Measured on TPU v5e at
    the shear-warp headline config the dot form is substantially faster
    than the unrolled hat expansion, especially backward (the R-term
    accumulate chain becomes one matmul whose adjoint is also a matmul);
    see experiments/fastpath_profile_results.jsonl.

    Gradients flow through a hand-written VJP (two MXU dots against
    rebuilt hat/box weights; see ``_apply_tf_dot_bwd``).

    Round 3: dispatches to the two-level hierarchical classify
    (:func:`_apply_tf_dot2_p`, ~4x less per-sample VPU work at R=128 —
    value-identical at HIGHEST) whenever R divides into the bin size.
    """
    R = tf.shape[0]
    if R % _TF_BIN == 0 and R >= 4 * _TF_BIN:
        return _apply_tf_dot2_p(precision, tf, intensity)
    return _apply_tf_dot_p(precision, tf, intensity)


def apply_tf_dot_soa(tf: Array, intensity: Array,
                     precision=jax.lax.Precision.HIGHEST):
    """SoA-channel :func:`apply_tf_dot` — the exact march's TF lookup.

    Bit-identical to :func:`apply_tf` at HIGHEST precision (the default
    here: the exact path promises bit-parity).  Measured (fwd_ablate in
    experiments/row_scatter_results.jsonl): the unrolled hat expansion
    costs 67 ms per (32, 512^2) march block at R=128 — 30% of the whole
    forward — because its R-term accumulate chain is VPU-serial; the dot
    form moves the accumulation to the MXU.
    Returns (r, g, b, a) each shaped like ``intensity``.
    """
    out = apply_tf_dot(tf, intensity, precision=precision)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]


def apply_tf(tf: Array, intensity: Array) -> Array:
    """1D linear interpolation into the RGBA transfer-function texture.

    ``index = intensity * (R-1)``; ``mix(tf[low], tf[min(high, R-1)], frac)``
    (`/root/reference/differender/volume_raycaster.py:205-219`).  ``low`` is
    additionally clamped to ``R-1`` here: the reference reads out of bounds
    for intensities > 1 (undefined behavior); in-range inputs are bit-exact.

    Args:
        tf: (R, 4) RGBA texture.
        intensity: (...,) scalars.
    Returns:
        (..., 4) RGBA.
    """
    R = tf.shape[0]
    t = jnp.maximum(intensity * (R - 1.0), 0.0)   # low_high_frac's max (`:17`)
    low = jnp.floor(t)
    frac = (t - low)[..., None]
    low = jnp.minimum(low.astype(jnp.int32), R - 1)
    high = jnp.minimum(low + 1, R - 1)
    return tf[low] * (1.0 - frac) + tf[high] * frac
