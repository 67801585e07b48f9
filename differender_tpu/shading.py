"""Blinn-Phong-style headlight shading and opacity correction.

Re-derivation of the shading block inside the reference march kernels
(`/root/reference/differender/volume_raycaster.py:281-299` diff path,
`:329-347` nondiff path).  Light source sits at ``look_from + (0, 1, 0)``
(`:281`); ``light_dir`` points FROM the light TO the sample (`:288-290`) —
an idiosyncrasy we replicate exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig

Array = jax.Array


def opacity_correction(alpha: Array, sampling_rate: Array | float) -> Array:
    """``a = 1 - (1-a)^(1/sampling_rate)``
    (`/root/reference/differender/volume_raycaster.py:284-285`)."""
    return 1.0 - jnp.power(jnp.maximum(1.0 - alpha, 0.0), 1.0 / sampling_rate)


def premultiply_alpha(rgba: Array) -> Array:
    """``rgba.rgb *= rgba.a`` — API parity with the reference helper
    (`/root/reference/differender/volume_raycaster.py:23-26`; dead code
    there, provided here for completeness).  The renderer's composited
    output is already premultiplied."""
    return jnp.concatenate([rgba[..., :3] * rgba[..., 3:4], rgba[..., 3:4]],
                           axis=-1)


# -- gradient-safe unit normals ---------------------------------------------
#
# d(g/|g|)/dg = (I - n n^T)/|g| diverges as |g| -> 0.  The reference's Taichi
# autodiff produces inf/NaN there and scrubs them with ``torch.nan_to_num``
# (`/root/reference/differender/volume_raycaster.py:463-464`).  We instead
# keep the forward EXACT (true unit normal whenever |g| > 0, zero otherwise)
# and clamp only the VJP's 1/|g| factor, so gradients are exact for any
# non-degenerate sample and bounded — never NaN — for degenerate ones.
_NORMAL_BWD_EPS = 1e-6


@jax.custom_vjp
def unit_normal(grad: Array) -> Array:
    g2 = jnp.sum(grad * grad, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.where(g2 > 0.0, g2, 1.0))
    return grad * jnp.where(g2 > 0.0, inv, 0.0)


def _unit_normal_fwd(grad):
    n = unit_normal(grad)
    mag = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    return n, (n, mag)


def _unit_normal_bwd(res, v):
    n, mag = res
    inv = 1.0 / jnp.maximum(mag, _NORMAL_BWD_EPS)
    return ((v - jnp.sum(v * n, axis=-1, keepdims=True) * n) * inv,)


unit_normal.defvjp(_unit_normal_fwd, _unit_normal_bwd)


@jax.custom_vjp
def unit_normal_soa(gx: Array, gy: Array, gz: Array):
    """Component-wise (structure-of-arrays) variant of :func:`unit_normal`
    for hot paths that avoid trailing-3 tensors (TPU layout traps)."""
    g2 = gx * gx + gy * gy + gz * gz
    inv = jax.lax.rsqrt(jnp.where(g2 > 0.0, g2, 1.0))
    m = jnp.where(g2 > 0.0, inv, 0.0)
    return gx * m, gy * m, gz * m


def _unit_normal_soa_fwd(gx, gy, gz):
    n = unit_normal_soa(gx, gy, gz)
    mag = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    return n, (n, mag)


def _unit_normal_soa_bwd(res, v):
    (nx, ny, nz), mag = res
    vx, vy, vz = v
    inv = 1.0 / jnp.maximum(mag, _NORMAL_BWD_EPS)
    dot = vx * nx + vy * ny + vz * nz
    return ((vx - dot * nx) * inv, (vy - dot * ny) * inv,
            (vz - dot * nz) * inv)


unit_normal_soa.defvjp(_unit_normal_soa_fwd, _unit_normal_soa_bwd)


def shade_soa(
    px: Array, py: Array, pz: Array,        # (...,) sample position
    gx: Array, gy: Array, gz: Array,        # (...,) unnormalized gradient
    r: Array, g: Array, b: Array, a: Array,  # (...,) TF color channels
    vdx: Array, vdy: Array, vdz: Array,     # per-ray view direction
    look_from: Array,                       # (3,)
    sampling_rate,
    config: RenderConfig,
    clamp_light: bool = True,
):
    """Structure-of-arrays :func:`shade` — identical math, no trailing-3/4
    tensors (TPU hot-path layout; see the SoA section of
    :mod:`differender_tpu.sampling`).  Returns premultiplied channels
    ``(r*a*light, g*..., b*..., alpha)``, each (...,)."""
    alpha = opacity_correction(a, sampling_rate)

    g2 = gx * gx + gy * gy + gz * gz
    has_n = g2 > 0.0
    nx, ny, nz = unit_normal_soa(gx, gy, gz)

    lpx = look_from[0]
    lpy = look_from[1] + np.float32(1.0)    # headlight at lf + (0,1,0)
    lpz = look_from[2]
    ldx, ldy, ldz = px - lpx, py - lpy, pz - lpz
    lmag = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
    inv = 1.0 / jnp.where(lmag > 0.0, lmag, 1.0)
    ldx, ldy, ldz = ldx * inv, ldy * inv, ldz * inv

    dot = nx * ldx + ny * ldy + nz * ldz
    diffuse = config.diffuse * jnp.where(has_n, jnp.maximum(dot, 0.0), 0.0)

    # GLSL reflect(I, N) = I - 2*dot(N, I)*N  (`tl.reflect`, `:293-294`)
    rx = ldx - 2.0 * dot * nx
    ry = ldy - 2.0 * dot * ny
    rz = ldz - 2.0 * dot * nz
    r_dot_v = jnp.maximum(-(rx * vdx + ry * vdy + rz * vdz), 0.0)
    specular = config.specular * jnp.where(
        has_n, jnp.power(r_dot_v, config.shininess), 0.0)

    light = diffuse + specular + config.ambient
    if clamp_light:
        light = jnp.minimum(1.0, light)

    lc = np.asarray(config.light_color, np.float32)
    la = light * alpha
    return r * la * lc[0], g * la * lc[1], b * la * lc[2], alpha


def shade(
    pos: Array,             # (..., 3) sample position
    grad: Array,            # (..., 3) unnormalized volume gradient
    sample_rgba: Array,     # (..., 4) TF color (pre opacity correction)
    view_dir: Array,        # (..., 3) per-ray direction
    look_from: Array,       # (3,) camera position
    sampling_rate,          # traced or python float
    config: RenderConfig,
    clamp_light: bool = True,
) -> Array:
    """Shade one sample; returns (..., 4) premultiplied ``(rgb*a, a)``.

    ``clamp_light=True`` applies the ``min(1, diffuse+specular+ambient)``
    clamp present only in the library's differentiable kernel
    (`/root/reference/differender/volume_raycaster.py:297-298`); the nondiff
    kernel (`:344-347`) and the standalone example omit it (SURVEY §2.9).

    Zero-gradient handling: the reference normalizes a zero gradient to NaN
    and then relies on CUDA ``fmaxf(NaN, 0) == 0`` to zero both the diffuse
    and specular terms.  We gate both terms on ``‖grad‖ > 0`` explicitly,
    which reproduces that behavior with well-defined JAX semantics (and
    NaN-free gradients).
    """
    alpha = opacity_correction(sample_rgba[..., 3], sampling_rate)

    has_n = jnp.sum(grad * grad, axis=-1) > 0.0
    normal = unit_normal(grad)

    light_pos = look_from + np.array([0.0, 1.0, 0.0], np.float32)
    ldir = pos - light_pos
    lmag = jnp.linalg.norm(ldir, axis=-1, keepdims=True)
    light_dir = ldir / jnp.where(lmag > 0.0, lmag, 1.0)

    n_dot_l = jnp.maximum(jnp.sum(normal * light_dir, axis=-1), 0.0)
    diffuse = config.diffuse * jnp.where(has_n, n_dot_l, 0.0)

    # GLSL reflect(I, N) = I - 2*dot(N, I)*N  (`tl.reflect`, `:293-294`)
    refl = light_dir - 2.0 * jnp.sum(normal * light_dir, axis=-1, keepdims=True) * normal
    r_dot_v = jnp.maximum(jnp.sum(refl * (-view_dir), axis=-1), 0.0)
    specular = config.specular * jnp.where(
        has_n, jnp.power(r_dot_v, config.shininess), 0.0
    )

    light = diffuse + specular + config.ambient
    if clamp_light:
        light = jnp.minimum(1.0, light)

    light_color = np.asarray(config.light_color, np.float32)
    rgb = light[..., None] * sample_rgba[..., :3] * alpha[..., None] * light_color
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
