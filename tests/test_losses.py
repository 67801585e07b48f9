import numpy as np
import jax
import jax.numpy as jnp

from differender_tpu.losses import mse_loss, ssim, dssim_mse_loss


def test_mse():
    a = jnp.ones((4, 8, 8))
    b = jnp.zeros((4, 8, 8))
    assert float(mse_loss(a, b)) == 1.0
    assert float(mse_loss(a, a)) == 0.0


def test_ssim_identity(rng):
    x = jnp.asarray(rng.random((1, 4, 24, 24), dtype=np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.random((1, 3, 24, 24), dtype=np.float32))
    key = jax.random.PRNGKey(0)
    y1 = x + 0.05 * jax.random.normal(key, x.shape)
    y2 = x + 0.4 * jax.random.normal(key, x.shape)
    s1, s2 = float(ssim(x, y1)), float(ssim(x, y2))
    assert 1.0 > s1 > s2


def test_ssim_batch_and_3d(rng):
    x = jnp.asarray(rng.random((2, 4, 16, 16), dtype=np.float32))
    per = ssim(x, x, size_average=False)
    assert per.shape == (2,)
    s3 = ssim(x[0], x[0])
    assert abs(float(s3) - 1.0) < 1e-5


def test_ssim_nonnegative_flag(rng):
    x = jnp.asarray(rng.random((1, 1, 16, 16), dtype=np.float32))
    y = 1.0 - x
    s = float(ssim(x, y, nonnegative_ssim=True))
    assert s >= 0.0


def test_dssim_mse(rng):
    x = jnp.asarray(rng.random((1, 4, 24, 24), dtype=np.float32))
    assert float(dssim_mse_loss(x, x)) < 1e-5
    y = jnp.zeros_like(x)
    assert float(dssim_mse_loss(x, y)) > 0.1


def test_ssim_differentiable(rng):
    x = jnp.asarray(rng.random((1, 4, 16, 16), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 4, 16, 16), dtype=np.float32))
    g = jax.grad(lambda a: dssim_mse_loss(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
