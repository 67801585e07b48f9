import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differender_tpu.transfer import (get_tf, get_tf_torch_layout,
                                      tex_from_pts, random_peaks_tf)


def test_tex_from_pts_linear_interp():
    pts = [[0.0, 0.0, 0.0, 0.0, 0.0],
           [0.5, 1.0, 0.5, 0.25, 0.8],
           [1.0, 0.0, 0.0, 0.0, 0.0]]
    tex = np.asarray(tex_from_pts(pts, 5))   # sampled at 0, .25, .5, .75, 1
    assert tex.shape == (5, 4)
    np.testing.assert_allclose(tex[0], [0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(tex[2], [1.0, 0.5, 0.25, 0.8], atol=1e-6)
    np.testing.assert_allclose(tex[1], [0.5, 0.25, 0.125, 0.4], atol=1e-6)
    np.testing.assert_allclose(tex[4], [0, 0, 0, 0], atol=1e-6)


@pytest.mark.parametrize("tf_id", ["tf1", "tf2", "tf3", "tf4", "tf5"])
def test_presets(tf_id):
    tex = np.asarray(get_tf(tf_id, 128))
    assert tex.shape == (128, 4)
    assert (tex >= 0).all() and (tex <= 1).all()
    assert tex[..., 3].max() > 0.05   # some visible alpha


def test_black_gray_rand():
    b = np.asarray(get_tf("black", 64))
    np.testing.assert_allclose(b, 1e-2)
    g = np.asarray(get_tf("gray", 64))
    np.testing.assert_allclose(g[:, :3], 0.5)
    np.testing.assert_allclose(g[:, 3], 0.02)
    r = np.asarray(get_tf("rand", 64, key=jax.random.PRNGKey(0)))
    assert r.shape == (64, 4)
    with pytest.raises(ValueError):
        get_tf("rand", 64)
    with pytest.raises(ValueError):
        get_tf("nope", 64)


def test_generate():
    t = np.asarray(get_tf("generate", 128, key=jax.random.PRNGKey(2)))
    assert t.shape == (128, 4)
    assert t[:, 3].max() > 0.1
    t2 = np.asarray(random_peaks_tf(jax.random.PRNGKey(3), 128))
    assert not np.allclose(t, t2)


def test_torch_layout():
    a = np.asarray(get_tf("tf1", 128))
    b = np.asarray(get_tf_torch_layout("tf1", 128))
    np.testing.assert_array_equal(a.T, b)
