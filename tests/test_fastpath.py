"""Shear-warp fast renderer: visual equivalence with the exact renderer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differender_tpu import RenderConfig, render, get_tf
from differender_tpu.fastpath import render_fast
from differender_tpu.losses import ssim


def _setup(sphere_volume, hw=(32, 32)):
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=hw,
                       tf_resolution=32, max_samples=256, block_size=32)
    tf = jnp.asarray(get_tf("tf5", 32))
    return cfg, tf


@pytest.mark.parametrize("lf", [
    [1.3, 0.7, 2.1],      # principal z
    [2.3, 0.5, -0.8],     # principal x
    [0.4, 2.4, 0.7],      # principal y
    [-1.2, 0.6, -2.0],    # negative z side
])
def test_fast_close_to_exact(sphere_volume, lf):
    cfg, tf = _setup(sphere_volume)
    lf = jnp.asarray(np.array(lf, np.float32))
    exact = render(sphere_volume, tf, lf, cfg, sampling_rate=2.0,
                   ert=False).image
    fast = render_fast(sphere_volume, tf, lf, cfg, intermediate=192,
                       planes_per_voxel=4.0).image
    # different quadrature => tolerance-based visual equivalence; fidelity
    # converges with intermediate/planes density (0.73 -> 0.90 SSIM from
    # (96, 2.0) to (256, 6.0) on this scene)
    a = jnp.transpose(exact, (2, 0, 1))
    b = jnp.transpose(fast, (2, 0, 1))
    s = float(ssim(a, b, nonnegative_ssim=True))
    mad = float(jnp.abs(exact - fast).mean())
    assert s > 0.8, (s, mad)
    assert mad < 0.02, (s, mad)


def test_fast_empty_volume_is_black(sphere_volume):
    cfg, tf = _setup(sphere_volume)
    out = render_fast(jnp.zeros(sphere_volume.shape), get_tf("black", 32) * 0,
                      jnp.asarray([1.3, 0.7, 2.1]), cfg, intermediate=64)
    assert float(jnp.abs(out.image).max()) == 0.0


def test_fast_alpha_range(sphere_volume):
    cfg, tf = _setup(sphere_volume)
    out = render_fast(sphere_volume, tf, jnp.asarray([1.3, 0.7, 2.1]), cfg,
                      intermediate=64)
    a = np.asarray(out.image[..., 3])
    assert (a >= 0).all() and (a <= 1.0 + 1e-5).all()
    assert a.max() > 0.1


def test_fast_differentiable(sphere_volume):
    cfg, tf = _setup(sphere_volume, hw=(16, 16))
    lf = jnp.asarray([1.3, 0.7, 2.1])

    def loss(v, t):
        return jnp.sum(render_fast(v, t, lf, cfg, intermediate=48).image)

    gv, gt = jax.grad(loss, argnums=(0, 1))(jnp.asarray(sphere_volume), tf)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gt)).all()
    assert float(jnp.abs(gv).max()) > 0
    assert float(jnp.abs(gt).max()) > 0


def test_fast_misses_are_zero(sphere_volume):
    cfg, tf = _setup(sphere_volume)
    cfg = cfg.replace(fov=60.0)
    out = render_fast(sphere_volume, tf, jnp.asarray([0.0, 0.3, 1.8]), cfg,
                      intermediate=64)
    img = np.asarray(out.image)
    hit = np.asarray(out.hit)
    assert (~hit).any()
    assert np.all(img[~hit] == 0.0)


def test_slab_batch_padding_is_noop(sphere_volume):
    """Regression (round-3 review): padding slabs in the batched scan must
    be exact no-ops even for TFs with alpha at intensity 0 ('black') and a
    camera geometry whose extrapolated padding-plane positions re-enter
    the x/y footprint."""
    import jax
    from differender_tpu import RenderConfig, get_tf
    from differender_tpu.fastpath import render_fast
    vol = jnp.asarray(sphere_volume)
    lf = np.array([1.2, 0.8, -2.0], np.float32)
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16))
    tfb = jnp.asarray(np.asarray(get_tf("black", 32)))
    ppv = 63 / 32.0        # odd slab count -> padding at every batch > 1
    P = jax.lax.Precision.HIGHEST
    ref = render_fast(vol, tfb, lf, cfg, intermediate=32,
                      planes_per_voxel=ppv, precision=P, slab_batch=1).image
    for B in (2, 4):
        img = render_fast(vol, tfb, lf, cfg, intermediate=32,
                          planes_per_voxel=ppv, precision=P,
                          slab_batch=B).image
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   atol=1e-6)


class TestFidelityPolicy:
    """render_fast_auto / choose_fast_params: the SSIM gate either picks a
    passing shear-warp density or falls back to the exact renderer —
    raycast_fast speed can never silently cost correctness (round-3
    verdict: noise scenes rendered at SSIM 0.58 with no fallback)."""

    def test_gate_pass_uses_shearwarp(self, sphere_volume):
        from differender_tpu.fastpath import render_fast_auto
        cfg, tf = _setup(sphere_volume)
        lf = jnp.asarray([1.3, 0.7, 2.1])
        out, info = render_fast_auto(sphere_volume, tf, lf, cfg,
                                     ssim_gate=-1.0)  # first rung passes
        assert info["renderer"] == "shearwarp"
        assert info["trace"][0]["ssim"] == info["ssim"]
        ref = render_fast(jnp.asarray(sphere_volume), tf, lf, cfg,
                          intermediate=info["intermediate"],
                          planes_per_voxel=info["planes_per_voxel"])
        np.testing.assert_array_equal(np.asarray(out.image),
                                      np.asarray(ref.image))

    def test_gate_fail_falls_back_to_exact(self, rng):
        from differender_tpu.fastpath import render_fast_auto
        # Unstructured content (the measured shear-warp failure mode).
        vol = rng.random((16, 16, 16), dtype=np.float32)
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16),
                           tf_resolution=32, max_samples=64, block_size=16)
        tf = jnp.asarray(get_tf("tf1", 32))
        lf = jnp.asarray([1.3, 0.7, 2.1])
        out, info = render_fast_auto(vol, tf, lf, cfg,
                                     ssim_gate=2.0,  # unpassable
                                     ladder=((None, 2.0),))
        assert info["renderer"] == "exact"
        assert len(info["trace"]) == 1
        exact = render(jnp.asarray(vol), tf, lf, cfg,
                       sampling_rate=cfg.sampling_rate)
        np.testing.assert_array_equal(np.asarray(out.image),
                                      np.asarray(exact.image))
