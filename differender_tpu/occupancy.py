"""TF-dependent empty-space acceleration structure for the nondiff march.

The reference's fast inference kernel skips *work* per sample when the
classified alpha is tiny (``raycast_nondiff``,
`/root/reference/differender/volume_raycaster.py:334`), but still pays the
volume fetch at every step — at its flagship workload (800x800 image,
sampling_rate 16, `/root/reference/examples/render_nondiff.py:20,27`) that
is a ~24k-step gather-bound march per ray, which on this TPU stack took
45.5 s at 512^2 and crashed the worker at 800^2 (BASELINE.md round 2).

This module adds the missing empty-space *data structure*, TPU-first:

  1. a macrocell grid of per-cell intensity (min, max) over the cell's
     voxels plus a 1-voxel halo (the trilinear footprint of any sample
     whose position lies in the cell — interpolation is convex, so sampled
     intensities are bounded by the halo'd corner range);
  2. a TF alpha range-max table ``maxtab[lo, hi] = max(alpha[lo..hi])``:
     a cell is OCCUPIED iff the TF's maximum alpha over the cell's
     intensity range exceeds ``alpha_skip`` (again convexity: the lerped
     alpha between texels is bounded by the texel max);
  3. an L-inf distance-to-occupied field over macrocells, built by
     iterated 3^3 max-pool dilations.

The march then *jumps*: from a ray head in a cell at distance d >= 1, every
point within world L-inf distance (d-1)*cell_world of the head is inside
empty cells, so the per-ray step index may advance by
``floor((d-1)*cell_world / dt)`` without evaluating a single sample — the
skipped samples are GUARANTEED to satisfy the reference's own skip
condition (TF alpha <= alpha_skip), so the rendered image is bit-for-bit
the one the reference's per-sample skip produces.  Sample positions stay
on the original lattice (entry/exit/n_samples untouched).

Everything is static-shaped: the distance field is a (nx, ny, nz) i32
array, the jump is elementwise math plus ONE small-table gather per ray
per march iteration (macrocell grids are <= a few hundred KB — the cheap
end of this stack's measured gather pricing).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OccupancyGrid:
    """Static-shape empty-space structure (see module docstring).

    A pytree whose only dynamic leaf is ``dist`` — the geometry metadata is
    static aux data, so a prebuilt grid can be passed through ``jit``
    boundaries (strip rendering, cached-view inference).

    Attributes:
        dist: (nx*ny*nz,) int32 flat L-inf distance-to-occupied in
            macrocells; 0 = the cell itself may contain alpha > threshold.
        shape: (nx, ny, nz) macrocell grid shape (static).
        cell: macrocell edge in voxels (static).
        cell_world: conservative world-space L-inf size of one macrocell
            step (min over axes; static float).
    """

    dist: Array
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    cell: int = dataclasses.field(metadata=dict(static=True))
    cell_world: float = dataclasses.field(metadata=dict(static=True))


def tf_alpha_range_max(tf: Array) -> Array:
    """(R, R) table: ``maxtab[lo, hi] = max(alpha[lo..hi])`` (0 for
    lo > hi).  R <= ~256 keeps this trivially small."""
    alpha = tf[:, 3]
    R = alpha.shape[0]
    idx = jnp.arange(R)
    # (lo, hi, k) mask -> max.  R^3 elementwise ops; R=128 -> 2M lanes.
    in_range = (idx[None, None, :] >= idx[:, None, None]) & \
               (idx[None, None, :] <= idx[None, :, None])
    return jnp.max(jnp.where(in_range, alpha[None, None, :], 0.0), axis=-1)


def _cell_minmax(volume: Array, cell: int):
    """Per-macrocell (min, max) of voxel values over the cell + 1-voxel
    upper/lower halo (the corner footprint of any sample in the cell)."""
    X, Y, Z = volume.shape
    nx, ny, nz = (-(-X // cell), -(-Y // cell), -(-Z // cell))
    # Pad so the grid divides evenly; edge replication keeps ranges tight.
    pads = (nx * cell - X, ny * cell - Y, nz * cell - Z)
    vol = jnp.pad(volume, [(0, p) for p in pads], mode="edge")
    win = cell + 2
    # Window [c*cell - 1, (c+1)*cell] per axis == window size cell+2 with
    # stride cell starting at -1: pad one voxel low.
    vol = jnp.pad(vol, [(1, 1)] * 3, mode="edge")
    lo = jax.lax.reduce_window(vol, jnp.inf, jax.lax.min,
                               (win, win, win), (cell, cell, cell), "VALID")
    hi = jax.lax.reduce_window(vol, -jnp.inf, jax.lax.max,
                               (win, win, win), (cell, cell, cell), "VALID")
    return lo, hi, (nx, ny, nz)


def _maxpool3(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (3, 3, 3), (1, 1, 1), "SAME")


def build_occupancy(volume: Array, tf: Array, config: RenderConfig,
                    cell: Optional[int] = None,
                    max_dist: Optional[int] = None) -> OccupancyGrid:
    """Build the distance field for a (volume, TF) pair.

    ~One reduce_window over the volume + max_dist 3^3 max-pools over the
    macrocell grid; rebuild whenever the TF or volume changes (the
    reference's TF-optimization loop renders ground truth with a FIXED
    volume+TF, and inference renders many views of one pair — one build
    amortizes over all views).
    """
    auto_cell, auto_md = config.resolved_occupancy()
    cell = auto_cell if cell is None else cell
    max_dist = auto_md if max_dist is None else max_dist
    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    X, Y, Z = volume.shape
    R = tf.shape[0]

    lo, hi, grid_shape = _cell_minmax(volume, cell)
    maxtab = tf_alpha_range_max(tf)
    # Continuous TF coordinate x = intensity * (R-1), lerped between
    # floor/ceil texels (sampling.apply_tf) -> bounded by texel range
    # [floor(lo*(R-1)), ceil(hi*(R-1))].
    li = jnp.clip(jnp.floor(lo * (R - 1)), 0, R - 1).astype(jnp.int32)
    hi_i = jnp.clip(jnp.ceil(hi * (R - 1)), 0, R - 1).astype(jnp.int32)
    cell_max_alpha = maxtab[li, hi_i]
    occupied = cell_max_alpha > config.alpha_skip

    occ = occupied.astype(jnp.float32)
    dist = jnp.where(occupied, 0, max_dist)
    cur = occ
    for k in range(1, max_dist):
        cur = _maxpool3(cur)
        dist = jnp.minimum(dist, jnp.where(cur > 0, k, max_dist))

    # World L-inf size of one macrocell: voxel v spans 2/(size-1-1e-4) in
    # world units (see sampling._super_axis); take the min over axes so a
    # (d-1)-cell guarantee holds on every axis.
    scale = min(2.0 * cell / (s - 1.0 - 1e-4) for s in (X, Y, Z))
    return OccupancyGrid(dist=dist.astype(jnp.int32).reshape(-1),
                         shape=grid_shape, cell=cell,
                         cell_world=float(scale))


def jump_steps(grid: OccupancyGrid, volume_shape, px, py, pz, dt) -> Array:
    """Per-ray safe step advance from head positions (px, py, pz) (N,).

    Returns (N,) int32 >= 0: the number of consecutive samples from the
    head that are provably below the alpha-skip threshold (0 when the head
    cell is occupied or adjacent to one).
    """
    X, Y, Z = volume_shape
    nx, ny, nz = grid.shape

    def cell_of(p, size, n):
        v = jnp.clip(0.5 * p + 0.5, 0.0, 1.0) * np.float32(size - 1.0 - 1e-4)
        return jnp.clip((v / grid.cell).astype(jnp.int32), 0, n - 1)

    cx = cell_of(px, X, nx)
    cy = cell_of(py, Y, ny)
    cz = cell_of(pz, Z, nz)
    d = jnp.take(grid.dist, (cx * ny + cy) * nz + cz)
    safe_world = jnp.maximum(d - 1, 0).astype(jnp.float32) * np.float32(
        grid.cell_world)
    # dt == 0 on n<=1 rays; they march nothing anyway — keep the lane finite.
    return jnp.where(dt > 0, safe_world / jnp.maximum(dt, 1e-30),
                     0.0).astype(jnp.int32)
