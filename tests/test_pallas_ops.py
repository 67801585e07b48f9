"""Pallas kernel validation (interpreter mode on CPU, SURVEY §4 impl. 2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from differender_tpu.ops import tf_lookup_pallas, tf_lookup_reference


@pytest.fixture()
def interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def _data(n=3000, R=128, seed=0):
    rng = np.random.default_rng(seed)
    tf = jnp.asarray(rng.random((R, 4), dtype=np.float32))
    intensity = jnp.asarray(np.concatenate([
        rng.random(n - 6, dtype=np.float32),
        np.array([0.0, 1.0, -0.2, 1.3, 0.5, 0.999999], np.float32),
    ]))
    return tf, intensity


def test_forward_matches_reference(interp):
    tf, intensity = _data()
    got = tf_lookup_pallas(tf, intensity)
    want = tf_lookup_reference(tf, intensity)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_forward_2d_shape(interp):
    tf, intensity = _data(n=2048)
    got = tf_lookup_pallas(tf, intensity.reshape(32, 64))
    assert got.shape == (32, 64, 4)
    want = tf_lookup_reference(tf, intensity).reshape(32, 64, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vjp_matches_reference(interp):
    tf, intensity = _data(n=1500, seed=1)
    w = jnp.asarray(np.random.default_rng(2).random((1500, 4), np.float32))

    def loss_pallas(t, i):
        return jnp.sum(tf_lookup_pallas(t, i) * w)

    def loss_ref(t, i):
        return jnp.sum(tf_lookup_reference(t, i) * w)

    gt_p, gi_p = jax.grad(loss_pallas, argnums=(0, 1))(tf, intensity)
    gt_r, gi_r = jax.grad(loss_ref, argnums=(0, 1))(tf, intensity)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_r), atol=1e-5)
    # at exact texel boundaries the subgradient convention may differ;
    # compare away from them
    t = np.asarray(intensity) * 127.0
    interior = (np.abs(t - np.round(t)) > 1e-4) & (t > 0) & (t < 127)
    np.testing.assert_allclose(np.asarray(gi_p)[interior],
                               np.asarray(gi_r)[interior], atol=1e-4,
                               rtol=1e-4)
