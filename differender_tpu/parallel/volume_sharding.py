"""Spatially sharded volume rendering with halo exchange.

For volumes too large for one chip's HBM (the 1024³ stretch config in
BASELINE.md) the volume grid is sharded along its X axis over a mesh axis.
Because each shard's ownership region is a *convex* slab, every ray crosses
it in exactly one contiguous t-interval, so:

  1. each device exchanges 2-voxel boundary halos with its neighbors via
     ``lax.ppermute`` (the trilinear + central-difference-normal stencil
     reaches at most ``floor(px)+2`` / ``floor(px)-1``, i.e. 2 voxels past
     the slab for normal deltas < 1 voxel);
  2. each device marches ONLY the sample indices that can fall inside its
     slab (a per-ray window computed from the slab/ray intersection) and
     composites its segment locally, masked by an EXACT per-sample
     ownership test (``k*Xl <= px < (k+1)*Xl`` evaluated identically on all
     devices, so the partition is airtight);
  3. segments are ``all_gather``-ed and folded with the associative
     front-to-back "over" operator in per-pixel camera order (ascending
     shard index when the ray's x direction is positive, else descending).

Semantics: identical to ``render(..., ert=False)`` — early-ray termination
is inherently sequential across shards and is not applied (the unsharded
renderer exposes ``ert=False`` for exact cross-checking; differences vs the
ERT path are bounded by the 0.01 residual transmittance).  Gradients flow
through the halo exchange (``ppermute`` transpose) and segment composition,
giving exact sharded volume/TF gradients.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..geometry import RayBundle, make_rays, march_params
from ..sampling import apply_tf, sample_with_gradient_shard
from ..shading import shade
from ..render import RenderOutput, composite_block

Array = jax.Array

HALO = 2   # voxels: trilinear (+1) + normal stencil (+-delta < 1 voxel)


def shard_volume(volume: Array, mesh: Mesh, axis: str = "space") -> Array:
    """Device-put a global (X, Y, Z) volume sharded along X."""
    return jax.device_put(volume, NamedSharding(mesh, P(axis)))


def _exchange_halos(vol_local: Array, axis: str) -> Array:
    """Build (Xl + 2*HALO, Y, Z) = [left halo | local | right halo] with
    circular ``ppermute``.  The circular wrap delivers garbage into the
    outermost shards' outward halos, but the global index clamp in
    ``trilinear_shard`` guarantees those entries are never read."""
    k_count = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % k_count) for i in range(k_count)]
    bwd = [(i, (i - 1) % k_count) for i in range(k_count)]
    left = jax.lax.ppermute(vol_local[-HALO:], axis, fwd)
    right = jax.lax.ppermute(vol_local[:HALO], axis, bwd)
    return jnp.concatenate([left, vol_local, right], axis=0)


def _segment_window(rays: RayBundle, params, k, x_lo_vox, x_hi_vox,
                    scale_x, n_shards, length: int):
    """Per-ray start index of the sample window that can intersect shard k.

    The slab's world-x extent is ``[2*x_lo/scale - 1, 2*x_hi/scale - 1]``
    (inverse of the voxel-coordinate map); edge shards extend to +-inf
    because the coordinate clamp folds all outside positions onto them.
    The window only needs to be conservative — exact per-sample ownership
    masking does the real work.
    """
    big = jnp.float32(3.0e38)
    wx_lo = 2.0 * x_lo_vox / scale_x - 1.0
    wx_hi = 2.0 * x_hi_vox / scale_x - 1.0
    wx_lo = jnp.where(k == 0, -big, wx_lo)
    wx_hi = jnp.where(k == n_shards - 1, big, wx_hi)

    ox = rays.origin[0]
    dx = rays.dirs[..., 0]                                   # (H, W)
    safe_dx = jnp.where(jnp.abs(dx) > 1e-12, dx, 1.0)
    ta = (wx_lo - ox) / safe_dx
    tb = (wx_hi - ox) / safe_dx
    t_in = jnp.minimum(ta, tb)
    degenerate = jnp.abs(dx) <= 1e-12                        # ray ∥ slab

    safe_dt = jnp.where(params.dt > 0, params.dt, 1.0)
    s_lo = jnp.floor((t_in - params.t0) / safe_dt) - 1.0
    s_lo = jnp.where(degenerate | (params.dt <= 0), 0.0, s_lo)
    n_f = rays.n_samples.astype(jnp.float32)
    # Keep the fixed-length window inside [0, n]; clamp so short rays
    # re-scan (masked) tail steps instead of reading negative indices.
    s_lo = jnp.clip(s_lo, 0.0, jnp.maximum(n_f - length, 0.0))
    return s_lo.astype(jnp.int32)


def _over(a: Array, b: Array) -> Array:
    """The front-to-back "over" operator on premultiplied RGBA:
    ``a (+) b = a + (1 - a.alpha) * b``.  Associative (transmittances
    multiply, colors accumulate transmittance-weighted), which is what makes
    per-shard segment compositing exact and log-depth reducible."""
    return a + (1.0 - a[..., 3:4]) * b


def compose_segments(segments: Array, counts: Array, dir_x: Array):
    """Fold per-shard partial composites in per-pixel camera order.

    Scalable form: the over-operator is associative, so the K-segment fold
    is a ``lax.associative_scan`` (log K depth, no per-shard host-unrolled
    gathers — the previous form did a full (H, W, 4) ``take_along_axis``
    per shard, wrong shape for K >= 64 pod slices).  The per-pixel camera
    order only flips the *direction* of the fold, so both orientations are
    folded and selected per pixel.

    Args:
        segments: (K, H, W, 4) premultiplied RGBA segment composites.
        counts: (K, H, W) int32 per-segment active sample counts.
        dir_x: (H, W) per-ray x direction component (sign picks the order;
            a ray parallel to the slabs lives in one shard only, so its
            order is irrelevant).
    """
    fwd = jax.lax.associative_scan(_over, segments, axis=0)[-1]
    bwd = jax.lax.associative_scan(_over, segments[::-1], axis=0)[-1]
    acc = jnp.where((dir_x > 0)[..., None], fwd, bwd)
    total = 1 + jnp.sum(counts, axis=0)
    return acc, total


def segment_render(vol_local: Array, tf: Array, rays: RayBundle,
                   config: RenderConfig, sampling_rate, axis: str,
                   length: int, block: int):
    """Render this device's volume-shard segment and compose globally.

    Must be called inside a ``shard_map`` (or other SPMD context) that
    carries mesh axis ``axis`` with the volume sharded along X.  Returns the
    fully composed (image (H, W, 4), valid_steps (H, W)) replicated across
    ``axis``.  Used by :func:`render_volume_sharded` and by multi-axis
    training steps that combine view- and volume-parallelism.
    """
    X = config.volume_shape[0]
    n_shards = jax.lax.axis_size(axis)
    xl = vol_local.shape[0]
    k = jax.lax.axis_index(axis)
    padded = _exchange_halos(vol_local, axis)
    params = march_params(rays)
    scale_x = np.float32(X - 1.0 - 1e-4)
    s_lo = _segment_window(rays, params, k,
                           (k * xl).astype(jnp.float32),
                           ((k + 1) * xl).astype(jnp.float32),
                           scale_x, n_shards, length)
    sr_t = jnp.asarray(sampling_rate, jnp.float32)
    x_start = k * xl - HALO
    x_lo_vox = (k * xl).astype(jnp.float32)
    x_hi_vox = ((k + 1) * xl).astype(jnp.float32)

    def block_fn(carry, b):
        acc, cnt = carry
        offsets = b * block + jnp.arange(block, dtype=jnp.int32)
        steps = s_lo[None] + offsets[:, None, None]     # (K, H, W) per-ray
        t = params.t0[None] + steps.astype(jnp.float32) * params.dt[None]
        pos = rays.origin + t[..., None] * rays.dirs[None]
        px = jnp.clip(0.5 * pos[..., 0] + 0.5, 0.0, 1.0) * scale_x
        own = (px >= x_lo_vox) & (px < x_hi_vox)
        intensity, grad = sample_with_gradient_shard(
            padded, pos, config.volume_shape, x_start, config.normal_delta)
        sample_rgba = apply_tf(tf, intensity)
        shaded = shade(pos, grad, sample_rgba, rays.dirs[None], rays.origin,
                       sr_t, config, clamp_light=True)
        eligible = own & (steps < rays.n_samples[None]) \
            & (steps < config.max_samples)
        # No cross-shard ERT (sequential across devices); matches
        # render(..., ert=False) exactly — see module docstring.
        acc, cnt, _ = composite_block(acc, cnt, shaded, eligible, config,
                                      ert=False)
        return (acc, cnt), None

    block_fn = jax.checkpoint(block_fn, prevent_cse=False)
    H, W = config.image_shape
    acc0 = jnp.zeros((H, W, 4), jnp.float32)
    cnt0 = jnp.zeros((H, W), jnp.int32)
    (acc, cnt), _ = jax.lax.scan(block_fn, (acc0, cnt0),
                                 jnp.arange(length // block, dtype=jnp.int32))
    segs = jax.lax.all_gather(acc, axis)        # (K, H, W, 4)
    cnts = jax.lax.all_gather(cnt, axis)        # (K, H, W)
    return compose_segments(segs, cnts, rays.dirs[..., 0])


def segment_length(config: RenderConfig, sampling_rate: float,
                   segment_max_samples: Optional[int] = None,
                   block: Optional[int] = None):
    """(length, block) for :func:`segment_render`, block-aligned."""
    full = config.diff_march_steps(float(sampling_rate))
    length = full if segment_max_samples is None else min(
        segment_max_samples, full)
    b = max(1, min(config.block_size if block is None else block, length))
    return -(-length // b) * b, b


def render_volume_sharded(
    volume: Array,                 # global (X, Y, Z), sharded or replicated
    tf: Array,
    look_from: Array,
    config: RenderConfig,
    mesh: Mesh,
    axis: str = "space",
    sampling_rate: Optional[float] = None,
    key: Optional[Array] = None,
    segment_max_samples: Optional[int] = None,
) -> RenderOutput:
    """Differentiable render of an X-sharded volume (see module docstring).

    ``segment_max_samples`` bounds each shard's march window (defaults to
    the full unsharded bound — always exact; smaller values trade worst-case
    oblique-ray coverage for per-device work ~``max_samples/K``).
    """
    sr = config.sampling_rate if sampling_rate is None else sampling_rate
    n_shards = mesh.shape[axis]
    X = config.volume_shape[0]
    assert X % n_shards == 0, "volume X axis must divide the mesh axis"
    xl = X // n_shards

    length, block = segment_length(config, float(sr), segment_max_samples)

    volume = jnp.asarray(volume, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    rays = make_rays(look_from, config, sr, jitter_key=key)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def segment_fn(vol_local, tf_, origin, dirs, entry, exit_, n_samples):
        rays_l = RayBundle(origin=origin, dirs=dirs, entry=entry,
                           exit=exit_, n_samples=n_samples)
        return segment_render(vol_local, tf_, rays_l, config, sr, axis,
                              length, block)

    # jit is required around shard_map bodies containing remat (closed_call)
    # and is what we want anyway — one compiled SPMD program.
    image, valid = jax.jit(segment_fn)(volume, tf, rays.origin, rays.dirs,
                                       rays.entry, rays.exit, rays.n_samples)
    return RenderOutput(image=image, valid_steps=valid,
                        n_samples=rays.n_samples)
