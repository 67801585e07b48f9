"""Image losses used by the reference training loops.

* MSE — `/root/reference/examples/test_opt_tf.py:71` and the on-device MSE
  kernel `/root/reference/examples/taichi_volume_raycaster.py:368-373`.
* SSIM — replaces ``pytorch_msssim.ssim`` (`/root/reference/examples/test_opt_tf.py:14,70`):
  standard Wang et al. SSIM with an 11x11 Gaussian window (sigma 1.5),
  implemented as depthwise convolutions that XLA maps onto the TPU conv
  units.  ``nonnegative_ssim`` matches pytorch_msssim's flag (relu on the
  per-pixel map).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def mse_loss(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int, sigma: float):
    import numpy as np
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _filter2d(img: Array, win: Array) -> Array:
    """Depthwise 'valid' convolution of (N, C, H, W) with a (k, k) window.

    ``precision=HIGHEST`` is required: the TPU conv units default to bf16
    passes, and the SSIM moment arithmetic downstream cancels
    catastrophically at bf16 (measured SSIM 1.05 on near-identical images —
    BENCH_r02)."""
    n, c, h, w = img.shape
    kernel = jnp.tile(win[None, None], (c, 1, 1, 1))   # (C, 1, k, k)
    return jax.lax.conv_general_dilated(
        img, kernel,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(pred: Array, target: Array, data_range: float = 1.0,
         win_size: int = 11, win_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03,
         size_average: bool = True, nonnegative_ssim: bool = False) -> Array:
    """SSIM over (..., C, H, W) images (pytorch_msssim-compatible semantics)."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    lead = pred.shape[:-3]
    pred = pred.reshape((-1,) + pred.shape[-3:])
    target = target.reshape((-1,) + target.shape[-3:])

    win = jnp.asarray(_gaussian_window(win_size, win_sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d(pred, win)
    mu_y = _filter2d(target, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y

    # Second moments are computed about a constant shift (the global mean of
    # the target): covariances are shift-invariant in exact arithmetic, but
    # the naive E[x^2] - mu^2 form loses ~all mantissa bits when the local
    # mean dominates the local variance (BENCH_r02 recorded SSIM 1.0517 on
    # TPU).  The shift makes E[(x-c)^2] the same magnitude as the variance
    # itself, so the subtraction no longer cancels.  stop_gradient is exact:
    # d(sigma)/d(c) == 0 analytically.
    shift = jax.lax.stop_gradient(jnp.mean(target))
    predc = pred - shift
    targetc = target - shift
    mu_xc = mu_x - shift
    mu_yc = mu_y - shift
    sigma_xx = _filter2d(predc * predc, win) - mu_xc * mu_xc
    sigma_yy = _filter2d(targetc * targetc, win) - mu_yc * mu_yc
    sigma_xy = _filter2d(predc * targetc, win) - mu_xc * mu_yc
    # True variances are nonnegative; tiny negatives are pure rounding and
    # would let |cs| exceed 1 on near-constant windows.
    sigma_xx = jnp.maximum(sigma_xx, 0.0)
    sigma_yy = jnp.maximum(sigma_yy, 0.0)

    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    if nonnegative_ssim:
        ssim_map = jax.nn.relu(ssim_map)
    per_image = jnp.mean(ssim_map, axis=(1, 2, 3)).reshape(lead)
    return jnp.mean(per_image) if size_average else per_image


def dssim_mse_loss(pred: Array, target: Array, data_range: float = 1.0) -> Array:
    """``(1 - SSIM) + MSE`` with nan-scrubbing on the SSIM term — the loss of
    the volume inverse-rendering example
    (`/root/reference/examples/test_opt_tf.py:70-72`)."""
    dssim = 1.0 - ssim(pred, target, data_range=data_range,
                       nonnegative_ssim=True)
    return jnp.nan_to_num(dssim) + mse_loss(pred, target)
