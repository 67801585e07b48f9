"""Transfer-function presets and rasterization.

JAX re-implementation of `/root/reference/differender/utils/utils.py:7-79`.
The reference rasterizes piecewise-linear RGBA control points with
``torchvtk.utils.tex_from_pts``; here :func:`tex_from_pts` does the same with
``jnp.interp`` per channel (control points are (pos, r, g, b, a) rows with
pos in [0, 1], sampled at ``linspace(0, 1, res)``).

The reference returns textures channel-major ``(4, res)``; these utilities
use the renderer-native ``(res, 4)`` layout and :func:`get_tf_torch_layout`
provides the reference layout for API parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Control points copied from the reference presets
# (`/root/reference/differender/utils/utils.py:8-65`): rows of
# (position, r, g, b, alpha).
_TF_POINTS = {
    "tf1": [
        [0.0000, 0.0000, 0.0000, 0.0000, 0.0000],
        [0.0840, 0.8510, 0.7230, 0.4672, 0.0000],
        [0.0850, 0.8510, 0.7230, 0.4672, 0.0831],
        [0.1844, 0.8510, 0.7230, 0.4672, 0.0801],
        [0.1890, 0.8510, 0.7230, 0.4672, 0.0000],
        [0.2444, 0.8667, 0.5166, 0.6566, 0.0000],
        [0.2528, 0.7176, 0.0675, 0.3276, 0.0782],
        [0.2621, 0.8667, 0.5166, 0.6566, 0.0000],
        [0.3407, 0.9843, 0.9843, 0.9843, 0.0000],
        [0.3601, 0.9843, 0.9843, 0.9843, 0.3904],
        [0.4475, 0.9843, 0.9843, 0.9843, 0.3917],
        [0.4655, 0.9843, 0.9843, 0.9843, 0.0000],
        [1.0000, 0.0000, 0.0000, 0.0000, 0.0000],
    ],
    "tf2": [
        [0.0000, 0.0000, 0.0000, 0.0000, 0.0000],
        [0.0178, 0.5333, 0.3597, 0.1861, 0.0000],
        [0.0206, 0.5333, 0.3597, 0.1861, 0.1834],
        [0.0361, 0.5333, 0.3597, 0.1861, 0.1804],
        [0.0388, 0.5333, 0.3597, 0.1861, 0.0000],
        [0.2224, 0.6902, 0.0839, 0.1951, 0.0000],
        [0.2274, 0.6902, 0.0839, 0.1951, 0.0880],
        [0.2479, 0.6902, 0.0839, 0.1951, 0.0831],
        [0.2515, 0.6902, 0.0839, 0.1951, 0.0000],
        [0.2857, 0.9843, 0.9843, 0.9843, 0.0000],
        [0.3042, 0.9843, 0.9843, 0.9843, 0.8240],
        [0.4540, 0.9843, 0.9843, 0.9843, 0.8172],
        [0.4916, 0.9843, 0.9843, 0.9843, 0.0000],
        [1.0000, 0.0000, 0.0000, 0.0000, 0.0000],
    ],
    "tf3": [
        [0.0000, 0.0000, 0.0000, 0.0000, 0.0000],
        [0.0279, 0.5991, 0.6235, 0.1345, 0.0000],
        [0.0477, 0.5991, 0.6235, 0.1345, 0.1736],
        [0.1090, 0.5991, 0.6235, 0.1345, 0.1779],
        [0.1304, 0.5991, 0.6235, 0.1345, 0.0000],
        [0.3654, 0.9843, 0.9843, 0.9843, 0.0000],
        [0.3991, 0.9843, 0.9843, 0.9843, 0.3912],
        [0.7440, 0.9843, 0.9843, 0.9843, 0.3893],
        [0.7850, 0.9843, 0.9843, 0.9843, 0.0000],
        [1.0000, 0.0000, 0.0000, 0.0000, 0.0000],
    ],
    "tf4": [
        [0.0000, 0.0000, 0.0000, 0.0000, 0.0000],
        [0.0916, 0.5059, 0.1627, 0.1627, 0.0000],
        [0.1204, 0.5059, 0.1627, 0.1627, 0.1932],
        [0.1865, 0.5059, 0.1627, 0.1627, 0.1956],
        [0.2120, 0.5059, 0.1627, 0.1627, 0.0000],
        [0.4841, 0.9176, 0.9176, 0.9176, 0.0000],
        [0.5195, 0.9176, 0.9176, 0.9176, 0.6406],
        [0.6609, 0.9176, 0.9176, 0.9176, 0.6362],
        [0.6968, 0.9176, 0.9176, 0.9176, 0.0000],
        [1.0000, 0.0000, 0.0000, 0.0000, 0.0000],
    ],
    "tf5": [
        [0.0000, 0.0000, 0.0000, 0.0000, 0.0000],
        [0.1300, 0.5000, 0.5000, 0.5000, 0.0000],
        [0.1350, 0.5000, 0.5000, 0.5000, 0.7500],
        [0.1600, 0.5000, 0.5000, 0.5000, 0.7500],
        [0.1700, 0.5000, 0.5000, 0.5000, 0.0000],
        [1.0000, 0.0000, 0.0000, 0.0000, 0.0000],
    ],
}


def tex_from_pts(pts, res: int) -> Array:
    """Rasterize piecewise-linear control points to an ``(res, 4)`` texture.

    Functional stand-in for ``torchvtk.utils.tex_from_pts``
    (`/root/reference/differender/utils/utils.py:9`): samples each channel at
    ``linspace(0, 1, res)`` with linear interpolation between control points.
    """
    pts = jnp.asarray(pts, jnp.float32)
    xs = jnp.linspace(0.0, 1.0, res)
    chans = [jnp.interp(xs, pts[:, 0], pts[:, 1 + c]) for c in range(4)]
    return jnp.stack(chans, axis=-1).astype(jnp.float32)


def random_peaks_tf(key: Array, res: int, max_num_peaks: int = 2) -> Array:
    """Random transfer function built from TRAPEZOIDAL peaks rasterized
    through :func:`tex_from_pts` — mirroring the structure of
    ``torchvtk.utils.TFGenerator(max_num_peaks=2)``
    (`/root/reference/differender/utils/utils.py:74-77`), whose
    ``generate()`` emits per-peak control points (a flat-top trapezoid
    per peak, like the tf1–tf5 presets' 4-point plateaus) that
    ``tex_from_pts`` then rasterizes.  torchvtk itself is not available
    here, so the peak-parameter DISTRIBUTIONS below (count uniform in
    1..max, center/width/height/color ranges) are a documented analogue,
    not a bit-faithful port; the pipeline (peaks -> control points ->
    piecewise-linear rasterization) is the same.
    """
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    n_peaks = int(jax.random.randint(k1, (), 1, max_num_peaks + 1))
    centers = np.sort(np.asarray(jax.random.uniform(
        k2, (n_peaks,), minval=0.08, maxval=0.85)))
    widths = np.asarray(jax.random.uniform(
        k3, (n_peaks,), minval=0.02, maxval=0.15))
    # Flat-top fraction of the half-width (0 -> triangle, 1 -> box).
    top_frac = np.asarray(jax.random.uniform(
        k4, (n_peaks,), minval=0.1, maxval=0.9))
    heights = np.asarray(jax.random.uniform(
        k5, (n_peaks,), minval=0.15, maxval=0.95))
    colors = np.asarray(jax.random.uniform(
        k6, (n_peaks, 3), minval=0.05, maxval=1.0))

    pts = [[0.0, 0.0, 0.0, 0.0, 0.0]]
    prev_end = 0.0
    for c, w, tfr, h, (r, g, b) in zip(centers, widths, top_frac, heights,
                                       colors):
        t = w * tfr
        lo, hi = max(c - w, prev_end + 1e-4), min(c + w, 1.0 - 1e-4)
        ti, to = max(c - t, lo), min(c + t, hi)
        if not (lo < ti <= to < hi):
            continue                     # peak swallowed by its neighbor
        pts += [[lo, r, g, b, 0.0], [ti, r, g, b, h],
                [to, r, g, b, h], [hi, r, g, b, 0.0]]
        prev_end = hi
    pts += [[1.0, 0.0, 0.0, 0.0, 0.0]]
    return tex_from_pts(np.asarray(pts, np.float32), res)


def get_tf(tf_id: str, res: int, key: Array | None = None) -> Array:
    """Named transfer-function presets, renderer layout ``(res, 4)``.

    Mirrors ``get_tf`` (`/root/reference/differender/utils/utils.py:7-79`):
    ``tf1..tf5`` piecewise-linear presets, ``black`` = 1e-2 everywhere,
    ``gray`` = 0.5 color / 0.02 alpha, ``rand`` = uniform noise, ``generate``
    = random peaked TF.  ``rand``/``generate`` require ``key``.
    """
    if tf_id in _TF_POINTS:
        return tex_from_pts(np.array(_TF_POINTS[tf_id], np.float32), res)
    if tf_id == "black":
        return jnp.zeros((res, 4), jnp.float32) + 1e-2
    if tf_id == "gray":
        t = jnp.full((res, 4), 0.5, jnp.float32)
        return t.at[:, 3].set(0.02)
    if tf_id == "rand":
        if key is None:
            raise ValueError("get_tf('rand', ...) requires a PRNG key.")
        return jax.random.uniform(key, (res, 4), jnp.float32)
    if tf_id == "generate":
        if key is None:
            raise ValueError("get_tf('generate', ...) requires a PRNG key.")
        return random_peaks_tf(key, res)
    raise ValueError(f"Invalid Transfer function identifier given ({tf_id}).")


def get_tf_torch_layout(tf_id: str, res: int, key: Array | None = None) -> Array:
    """Preset in the reference's channel-major ``(4, res)`` layout
    (`/root/reference/differender/utils/utils.py:7-79`)."""
    return get_tf(tf_id, res, key).T
