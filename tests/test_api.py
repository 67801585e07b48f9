"""Raycaster API conventions: axis orders, batching/broadcast semantics,
and output orientation vs the reference contract
(`/root/reference/differender/volume_raycaster.py:478-574`)."""
import numpy as np
import jax
import jax.numpy as jnp

from differender_tpu import Raycaster, get_tf_torch_layout

import np_reference as ref


def _make(sphere_volume, W=6, H=6, **kw):
    # user volume convention: (1, D, H, W); internal is (W, D, H)
    vol_internal = sphere_volume                      # treat fixture as internal
    vol_user = np.transpose(vol_internal, (1, 2, 0))[None]  # (1, D, H, W)
    rc = Raycaster(vol_user.shape[1:], (W, H), 16, sampling_rate=0.5,
                   jitter=False, max_samples=64, block_size=8, **kw)
    tf_torch = np.asarray(get_tf_torch_layout("tf5", 16))   # (4, R)
    return rc, vol_user, tf_torch, vol_internal


def test_forward_shape_and_orientation(sphere_volume):
    rc, vol_user, tf_torch, vol_internal = _make(sphere_volume)
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    img = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch),
                     jnp.asarray(lf))
    assert img.shape == (4, 6, 6)
    want_wh4, _, _ = ref.render_np(vol_internal, tf_torch.T, lf, 6, 6, 0.5,
                                   max_samples=64)
    want = ref.to_image(want_wh4).transpose(2, 0, 1)  # (4, H, W)
    np.testing.assert_allclose(np.asarray(img), want, atol=3e-4)


def test_batched_forward(sphere_volume):
    rc, vol_user, tf_torch, _ = _make(sphere_volume)
    lfs = np.stack([[1.2, 0.8, 2.0], [-1.0, 0.4, 2.1]]).astype(np.float32)
    img = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch),
                     jnp.asarray(lfs))
    assert img.shape == (2, 4, 6, 6)
    # each batch item == unbatched render from that pose
    for k in range(2):
        single = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch),
                            jnp.asarray(lfs[k]))
        np.testing.assert_allclose(np.asarray(img[k]), np.asarray(single),
                                   atol=1e-5)


def test_broadcast_rules(sphere_volume):
    """'Anything batched => everything batched' (`:551-571`)."""
    rc, vol_user, tf_torch, _ = _make(sphere_volume)
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    vol_b = np.broadcast_to(vol_user, (3,) + vol_user.shape).copy()
    tf_b = np.broadcast_to(tf_torch, (3,) + tf_torch.shape).copy()
    lf_b = np.broadcast_to(lf, (3, 3)).copy()

    base = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch),
                      jnp.asarray(lf))
    for args in [(vol_b, tf_torch, lf), (vol_user, tf_b, lf),
                 (vol_user, tf_torch, lf_b), (vol_b, tf_b, lf_b)]:
        out = rc.forward(*map(jnp.asarray, args))
        assert out.shape == (3, 4, 6, 6)
        for k in range(3):
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(base),
                                       atol=1e-5)


def test_nondiff_default_sampling_rate(sphere_volume):
    rc, vol_user, tf_torch, _ = _make(sphere_volume)
    lf = jnp.array([1.2, 0.8, 2.0])
    a = rc.raycast_nondiff(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf)
    b = rc.raycast_nondiff(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf,
                           sampling_rate=4.0 * rc.sampling_rate)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert a.shape == (4, 6, 6)
    assert float(a.max()) <= 1.0 + 1e-6


def test_jitter_key_threading(sphere_volume):
    rc, vol_user, tf_torch, _ = _make(sphere_volume)
    rc.jitter = True
    lf = jnp.array([1.2, 0.8, 2.0])
    key = jax.random.PRNGKey(5)
    a = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf, key=key)
    b = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # internal-key convenience path draws fresh keys -> different images
    c = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf)
    d = rc.forward(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf)
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_grads_through_api(sphere_volume):
    rc, vol_user, tf_torch, _ = _make(sphere_volume)
    lf = jnp.array([1.2, 0.8, 2.0])

    def loss(v, t):
        return jnp.sum(rc.forward(v, t, lf))

    gv, gt = jax.grad(loss, argnums=(0, 1))(jnp.asarray(vol_user),
                                            jnp.asarray(tf_torch))
    assert gv.shape == vol_user.shape
    assert gt.shape == tf_torch.shape
    assert np.isfinite(np.asarray(gv)).all()
    assert float(jnp.abs(gt).max()) > 0.0


def test_repr(sphere_volume):
    rc, *_ = _make(sphere_volume)
    assert "Max Samples" in repr(rc)


def test_raycast_fast_api(sphere_volume):
    rc, vol_user, tf_torch, _ = _make(sphere_volume, W=16, H=16)
    lf = jnp.array([1.2, 0.8, 2.0])
    img = rc.raycast_fast(jnp.asarray(vol_user), jnp.asarray(tf_torch), lf,
                          intermediate=48)
    assert img.shape == (4, 16, 16)
    assert float(img[3].max()) > 0.05
    lfs = jnp.asarray(np.array([[1.2, 0.8, 2.0], [-1.0, 0.4, 2.1]],
                               np.float32))
    imgb = rc.raycast_fast(jnp.asarray(vol_user), jnp.asarray(tf_torch), lfs,
                           intermediate=48)
    assert imgb.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(np.asarray(imgb[0]), np.asarray(img),
                               atol=1e-5)
