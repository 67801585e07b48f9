"""The analytic-normals fast mode: exact values, near-identical shading."""
import numpy as np
import jax.numpy as jnp

from differender_tpu import RenderConfig, render, get_tf
from differender_tpu.sampling import (sample_with_gradient,
                                      sample_with_gradient_analytic)


def test_analytic_gradient_matches_central_difference(sphere_volume):
    vol = jnp.asarray(sphere_volume)
    rng = np.random.default_rng(0)
    # keep the +-delta stencil inside one cell: sample away from cell edges
    pos = jnp.asarray(rng.uniform(-0.8, 0.8, (500, 3)).astype(np.float32))
    i_ref, g_ref = sample_with_gradient(vol, pos)
    i_fast, g_fast = sample_with_gradient_analytic(vol, pos)
    np.testing.assert_allclose(np.asarray(i_ref), np.asarray(i_fast),
                               atol=1e-6)
    # gradients agree exactly when the stencil stays in-cell; across cell
    # boundaries they differ — compare where they agree in direction
    g_ref, g_fast = np.asarray(g_ref), np.asarray(g_fast)
    nr = np.linalg.norm(g_ref, axis=-1)
    nf = np.linalg.norm(g_fast, axis=-1)
    ok = (nr > 1e-5) & (nf > 1e-5)
    cos = np.sum(g_ref * g_fast, -1)[ok] / (nr[ok] * nf[ok])
    assert np.median(cos) > 0.99
    assert (cos > 0.9).mean() > 0.8


def test_fast_mode_render_close(sphere_volume):
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(8, 8),
                       max_samples=64, block_size=16)
    cfg_fast = cfg.replace(analytic_normals=True)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.array([1.2, 0.8, 2.0])
    a = render(sphere_volume, tf, lf, cfg, sampling_rate=0.6).image
    b = render(sphere_volume, tf, lf, cfg_fast, sampling_rate=0.6).image
    # alpha channel is value-exact; color differs only through normals
    np.testing.assert_allclose(np.asarray(a[..., 3]), np.asarray(b[..., 3]),
                               atol=1e-5)
    assert float(jnp.abs(a - b).mean()) < 0.02
