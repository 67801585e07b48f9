import numpy as np
import jax.numpy as jnp

from conftest import make_sphere_volume
from differender_tpu import RenderConfig, render, get_tf
from differender_tpu.profiling import annotate, timed, march_stats
from differender_tpu.shading import premultiply_alpha


def test_march_stats(shell_volume):
    cfg = RenderConfig(volume_shape=shell_volume.shape, image_shape=(8, 8),
                       max_samples=48, block_size=8)
    tf = np.zeros((16, 4), np.float32)
    tf[8:] = 0.95
    out = render(shell_volume, tf, jnp.asarray([0.0, 0.5, 2.6]),
                 cfg, sampling_rate=1.0)
    stats = march_stats(out)
    assert 0 < stats["hit_fraction"] <= 1.0
    assert stats["terminated_early_fraction"] > 0     # opaque TF => ERT
    assert stats["max_valid_steps"] <= stats["max_samples_requested"]


def test_annotate_and_timed():
    results = {}
    with annotate("test-scope"):
        with timed("block", results):
            _ = jnp.ones(8).sum()
    assert "block" in results and results["block"] >= 0


def test_premultiply_alpha():
    rgba = jnp.asarray(np.array([[0.5, 1.0, 0.25, 0.5]], np.float32))
    out = np.asarray(premultiply_alpha(rgba))
    np.testing.assert_allclose(out, [[0.25, 0.5, 0.125, 0.5]])
