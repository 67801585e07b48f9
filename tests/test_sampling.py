import numpy as np
import jax.numpy as jnp

from differender_tpu.sampling import trilinear, sample_with_gradient, apply_tf

import np_reference as ref


def test_trilinear_matches_oracle(rng):
    vol = rng.random((9, 7, 11), dtype=np.float32)
    pos = rng.uniform(-1.2, 1.2, size=(200, 3)).astype(np.float32)
    got = np.asarray(trilinear(jnp.asarray(vol), jnp.asarray(pos)))
    want = np.array([ref.trilinear(vol, p) for p in pos])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_hits_voxel_values(rng):
    """Sampling exactly at a voxel's continuous coordinate returns its value.

    Voxel (i,j,k) sits at normalized coord c = i/(s-1-1e-4) -> world
    pos = 2c - 1 (inverse of the reference mapping `:163-165`)."""
    vol = rng.random((8, 8, 8), dtype=np.float32)
    s = np.array(vol.shape, np.float64) - 1.0 - 1e-4
    for ijk in [(0, 0, 0), (3, 4, 5), (7, 7, 7), (1, 6, 2)]:
        c = np.array(ijk, np.float64) / s
        pos = jnp.asarray(2.0 * c - 1.0, jnp.float32)
        got = float(trilinear(jnp.asarray(vol), pos))
        assert abs(got - vol[ijk]) < 1e-3


def test_gradient_matches_oracle(rng):
    vol = rng.random((9, 9, 9), dtype=np.float32)
    pos = rng.uniform(-0.9, 0.9, size=(50, 3)).astype(np.float32)
    val, grad = sample_with_gradient(jnp.asarray(vol), jnp.asarray(pos))
    want_v = np.array([ref.trilinear(vol, p) for p in pos])
    want_g = np.array([ref.volume_gradient(vol, p) for p in pos])
    np.testing.assert_allclose(np.asarray(val), want_v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), want_g, atol=1e-5)


def test_apply_tf_matches_oracle(rng):
    tf = rng.random((32, 4), dtype=np.float32)
    intensity = np.concatenate([
        rng.random(100, dtype=np.float32),
        np.array([0.0, 1.0, 0.999999, 0.5], np.float32),
    ])
    got = np.asarray(apply_tf(jnp.asarray(tf), jnp.asarray(intensity)))
    want = np.array([ref.apply_tf(tf, i) for i in intensity])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_apply_tf_texel_exact(rng):
    tf = rng.random((16, 4), dtype=np.float32)
    idx = np.arange(16, dtype=np.float32) / 15.0
    got = np.asarray(apply_tf(jnp.asarray(tf), jnp.asarray(idx)))
    np.testing.assert_allclose(got, tf, atol=1e-5)
