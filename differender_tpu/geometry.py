"""Camera model, ray generation and ray–AABB intersection.

Pure JAX re-derivation of the reference's camera/ray code:
  * ``get_ray_direction``  — `/root/reference/differender/volume_raycaster.py:127-151`
  * ``get_entry_exit_points`` (slab method) — `:28-53`
  * ``compute_entry_exit`` kernel — `:221-259`

All functions are shape-polymorphic over a leading pixel batch and are
designed to be traced once under ``jit`` (static image shapes, no
data-dependent control flow).  Everything is float32.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig

Array = jax.Array


class RayBundle(NamedTuple):
    """Per-pixel ray state, the functional replacement of the reference's
    ``entry``/``exit``/``rays``/``sample_step_nums`` fields
    (`/root/reference/differender/volume_raycaster.py:86-88,85`).

    All arrays have leading shape ``(H, W)`` in standard image orientation
    (row 0 = top of image).  The reference stores buffers as ``(W, H)`` with a
    final flip+permute (`/root/reference/differender/volume_raycaster.py:543-548`);
    we bake that into ray generation instead.
    """

    origin: Array        # (3,) camera position (shared by all rays)
    dirs: Array          # (H, W, 3) normalized ray directions
    entry: Array         # (H, W) distance to (possibly jittered) volume entry
    exit: Array          # (H, W) distance to volume exit
    n_samples: Array     # (H, W) int32 per-ray sample count (0 on miss)


def normalize(v: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """Unit-normalize. With eps=0 this matches Taichi's ``.normalized()``
    (0/0 -> nan, exactly like the reference relies on IEEE semantics)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def safe_normalize(v: Array, axis: int = -1) -> Array:
    """Normalize that returns 0 for the zero vector (used where the reference
    depends on CUDA ``fmaxf(nan, 0) == 0`` to neutralize nans downstream)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), 0.0)


def ray_directions(look_from: Array, config: RenderConfig) -> Array:
    """Perspective ray directions for every pixel, image-oriented.

    Replicates ``get_ray_direction``
    (`/root/reference/differender/volume_raycaster.py:140-151`), including the
    reference's ``near_h = 2*tan(fov)*near`` quirk (``tan(fov)``, not
    ``tan(fov/2)``; `:146`).

    The camera always looks at the origin: ``view_dir = normalize(-look_from)``
    (`/root/reference/differender/volume_raycaster.py:232-233`).

    Pixel mapping: the reference iterates ``(i, j)`` over a ``(W, H)`` buffer
    with ``x=(i+0.5)/W``, ``y=(j+0.5)/H`` (`:239-240`) and finally flips the j
    axis and transposes to ``(H, W)`` (`:543-548`).  Composing the two, image
    row ``h`` / column ``w`` uses ``x=(w+0.5)/W`` and ``y=1-(h+0.5)/H``.

    Returns: (H, W, 3) float32 normalized directions.
    """
    H, W = config.image_shape
    look_from = look_from.astype(jnp.float32)
    view_dir = normalize(look_from * -1.0)

    x = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W          # (W,)
    y = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H    # (H,)
    u = x - 0.5                                               # (W,)
    v = y - 0.5                                               # (H,)

    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    right_raw = jnp.cross(view_dir, world_up)
    # Pole guard: for a camera on the +-y axis the reference's basis is
    # undefined (cross product vanishes -> NaN rays, reference UB).  Fall
    # back to x as the up hint there; random poses (get_rand_pos) can land
    # arbitrarily close to the poles.
    degenerate = jnp.sum(right_raw * right_raw) < 1e-12
    alt_up = np.array([1.0, 0.0, 0.0], np.float32)
    right_raw = jnp.where(degenerate, jnp.cross(view_dir, alt_up), right_raw)
    right = normalize(right_raw)
    up = normalize(jnp.cross(right, view_dir))

    near_h = 2.0 * jnp.tan(jnp.float32(config.fov_rad)) * config.near
    near_w = near_h * config.aspect

    # near_pos - orig = near*view_dir + u*near_w*right + v*near_h*up
    offset = (
        config.near * view_dir[None, None, :]
        + (u * near_w)[None, :, None] * right[None, None, :]
        + (v * near_h)[:, None, None] * up[None, None, :]
    )
    return normalize(offset)


def ray_aabb(origin: Array, dirs: Array, box_min, box_max):
    """Slab-method ray/AABB intersection, vectorized over pixels.

    Matches ``get_entry_exit_points``
    (`/root/reference/differender/volume_raycaster.py:28-53`): no guard
    against zero direction components (IEEE inf semantics), miss iff
    ``tmax < 0 or tmin > tmax``.  We additionally require finite tmin/tmax —
    the reference leaves the on-face-plane corner case undefined.

    Args:
        origin: (3,) ray origin.
        dirs: (..., 3) normalized directions.
        box_min/box_max: 3-sequences.
    Returns:
        (tmin, tmax, hit): (...,) f32, f32, bool.
    """
    box_min = np.asarray(box_min, np.float32)
    box_max = np.asarray(box_max, np.float32)
    dirfrac = 1.0 / dirs
    t_lo = (box_min - origin) * dirfrac   # (..., 3)
    t_hi = (box_max - origin) * dirfrac
    tmin = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    tmax = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    hit = ~((tmax < 0.0) | (tmin > tmax))
    hit = hit & jnp.isfinite(tmin) & jnp.isfinite(tmax)
    return tmin, tmax, hit


def make_rays(
    look_from: Array,
    config: RenderConfig,
    sampling_rate: float,
    jitter_key: Optional[Array] = None,
    box_min=(-1.0, -1.0, -1.0),
    box_max=(1.0, 1.0, 1.0),
) -> RayBundle:
    """Full ray setup: the functional ``compute_entry_exit`` kernel
    (`/root/reference/differender/volume_raycaster.py:221-259`).

    ``n_samples = hit * (floor(sampling_rate * ray_len * vol_diag) + 1)``
    (`:251-253`, Nyquist-multiplier rule).  With ``jitter_key`` given, the
    entry distance is advanced by ``U[0,1) * ray_len / n_samples`` (`:254-255`).
    Unlike the reference — whose backward replays the forward with a *fresh*
    RNG draw (`/root/reference/differender/volume_raycaster.py:456`) — the
    explicit key makes jittered renders exactly reproducible and their VJPs
    exact.
    """
    look_from = jnp.asarray(look_from, jnp.float32)
    dirs = ray_directions(look_from, config)
    tmin, tmax, hit = ray_aabb(look_from, dirs, box_min, box_max)

    ray_len = tmax - tmin
    n_f = jnp.floor(sampling_rate * ray_len * config.vol_diag) + 1.0
    n_samples = jnp.where(hit, n_f, 0.0).astype(jnp.int32)

    if jitter_key is not None:
        u = jax.random.uniform(jitter_key, tmin.shape, jnp.float32)
        step = ray_len / jnp.maximum(n_f, 1.0)
        tmin = jnp.where(hit, tmin + u * step, tmin)

    return RayBundle(
        origin=look_from,
        dirs=dirs,
        entry=tmin,
        exit=tmax,
        n_samples=n_samples,
    )


class MarchParams(NamedTuple):
    """Precomputed per-ray march parametrization.

    The reference computes, per sample ``s``:
      ``t0 = entry + 0.5*(exit-entry)/n``  (half-step offset, `:270-275`)
      ``t_s = mix(t0, exit, s/(n-1))``     (`:277-280`)
    i.e. ``t_s = t0 + s * dt`` with ``dt = (exit - t0)/(n-1)``.

    For ``n == 1`` the reference divides 0/0 (NaN pixels); we define
    ``dt = 0`` there (sample sits at t0), a deliberate fix, see SURVEY §2.5.
    """

    t0: Array   # (H, W)
    dt: Array   # (H, W)


def march_params(rays: RayBundle) -> MarchParams:
    n_f = rays.n_samples.astype(jnp.float32)
    safe_n = jnp.maximum(n_f, 1.0)
    ray_len = rays.exit - rays.entry
    t0 = rays.entry + 0.5 * ray_len / safe_n
    dt = (rays.exit - t0) / jnp.maximum(n_f - 1.0, 1.0)
    # Rays that miss march zero steps; n == 1 rays sample only at t0
    # (dt = 0 per the class docstring — the reference divides 0/0 there).
    # Zero params keep positions finite in masked-out lanes.
    t0 = jnp.where(rays.n_samples == 0, 0.0, t0)
    dt = jnp.where(rays.n_samples <= 1, 0.0, dt)
    return MarchParams(t0=t0, dt=dt)
