"""Golden-image regression tests (SURVEY §4 implication (4)).

The fixtures in ``golden_renders.npz`` pin the exact, shear-warp, and
volume-sharded renderers on the synthetic sphere (regenerate via
``python tests/regen_golden.py`` ONLY on an intentional semantics change
and note it in the commit message)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

import np_reference  # noqa: F401  (path sanity)
from conftest import make_sphere_volume
from differender_tpu import RenderConfig, render, render_nondiff, get_tf

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_renders.npz")


def _setup():
    vol = make_sphere_volume()
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16),
                       tf_resolution=32, max_samples=64, block_size=16)
    tf = np.asarray(get_tf("tf1", 32))
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    return vol, cfg, tf, lf


def test_golden_diff():
    vol, cfg, tf, lf = _setup()
    golden = np.load(GOLDEN)
    img = np.asarray(render(vol, tf, lf, cfg, sampling_rate=0.8).image)
    np.testing.assert_allclose(img, golden["diff"], atol=5e-5)


def test_golden_nondiff():
    vol, cfg, tf, lf = _setup()
    golden = np.load(GOLDEN)
    img = np.asarray(render_nondiff(vol, tf, lf, cfg, sampling_rate=1.5).image)
    np.testing.assert_allclose(img, golden["nondiff"], atol=5e-5)


def test_golden_jittered():
    vol, cfg, tf, lf = _setup()
    golden = np.load(GOLDEN)
    img = np.asarray(render(vol, tf, lf, cfg, sampling_rate=0.8,
                            key=jax.random.PRNGKey(7)).image)
    np.testing.assert_allclose(img, golden["jittered"], atol=5e-5)


def test_golden_shearwarp():
    """Pins the shear-warp renderer's OWN semantics (VERDICT r2 #9): any
    drift in the factorization/classify/composite chain fails here even if
    it stays within tolerance of the exact path."""
    from differender_tpu.fastpath import render_fast
    vol, cfg, tf, lf = _setup()
    golden = np.load(GOLDEN)
    img = np.asarray(render_fast(
        vol, tf, lf, cfg, intermediate=32, planes_per_voxel=2.0,
        precision=jax.lax.Precision.HIGHEST).image)
    np.testing.assert_allclose(img, golden["shearwarp"], atol=5e-5)


def test_golden_sharded():
    """Pins the volume-sharded renderer (halo exchange + camera-ordered
    segment composition) on a 4-device mesh slice."""
    from jax.sharding import Mesh
    from differender_tpu.parallel.volume_sharding import (
        render_volume_sharded, shard_volume)
    vol, cfg, tf, lf = _setup()
    golden = np.load(GOLDEN)
    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    img = np.asarray(render_volume_sharded(
        shard_volume(np.asarray(vol), mesh), tf, lf, cfg, mesh,
        sampling_rate=0.8).image)
    np.testing.assert_allclose(img, golden["sharded"], atol=5e-5)
