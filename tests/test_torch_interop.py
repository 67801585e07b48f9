"""Torch interop bridge: the reference's torch.nn.Module surface
(`/root/reference/differender/volume_raycaster.py:392-548`) served by the
JAX renderer.  Checks layout contract, autograd parity vs jax.grad,
batching, jitter-key replay, nan scrubbing, and the nondiff path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from differender_tpu import Raycaster, get_tf_torch_layout
from differender_tpu.torch_interop import TorchRaycaster


def _inputs(sphere_volume):
    vol_user = np.transpose(sphere_volume, (1, 2, 0))[None]   # (1, D, H, W)
    tf = np.asarray(get_tf_torch_layout("tf5", 16))           # (4, R)
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    return vol_user, tf, lf


def _make(sphere_volume, **kw):
    vol_user, tf, lf = _inputs(sphere_volume)
    kw.setdefault("jitter", False)
    m = TorchRaycaster(vol_user.shape[1:], (6, 6), 16, sampling_rate=0.5,
                       max_samples=64, block_size=8, **kw)
    return (m, torch.from_numpy(vol_user.copy()), torch.from_numpy(tf.copy()),
            torch.from_numpy(lf.copy()))


def test_forward_matches_jax_raycaster(sphere_volume):
    m, vol, tf, lf = _make(sphere_volume)
    img = m(vol, tf, lf)
    assert isinstance(img, torch.Tensor)
    assert img.shape == (4, 6, 6) and img.dtype == torch.float32
    rc = Raycaster(vol.shape[1:], (6, 6), 16, sampling_rate=0.5,
                   jitter=False, max_samples=64, block_size=8)
    want = rc.forward(jnp.asarray(vol.numpy()), jnp.asarray(tf.numpy()),
                      jnp.asarray(lf.numpy()))
    # jit-vs-eager fusion noise only (the bridge jits the render)
    np.testing.assert_allclose(img.numpy(), np.asarray(want), atol=1e-5)


def test_backward_matches_jax_grad(sphere_volume):
    """torch .backward() grads == jax.grad of the same scalar loss."""
    m, vol, tf, lf = _make(sphere_volume)
    vol.requires_grad_(True)
    tf.requires_grad_(True)
    img = m(vol, tf, lf)
    loss = (img ** 2).mean()
    loss.backward()

    rc = Raycaster(vol.shape[1:], (6, 6), 16, sampling_rate=0.5,
                   jitter=False, max_samples=64, block_size=8)
    gv, gt = jax.grad(
        lambda v, t: jnp.mean(rc.forward(v, t, jnp.asarray(lf.numpy())) ** 2),
        argnums=(0, 1))(jnp.asarray(vol.detach().numpy()),
                        jnp.asarray(tf.detach().numpy()))
    np.testing.assert_allclose(vol.grad.numpy(), np.asarray(gv),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(tf.grad.numpy(), np.asarray(gt),
                               atol=1e-6, rtol=1e-4)
    assert lf.grad is None  # reference contract: no camera grads (`:465`)


def test_camera_grads_opt_in(sphere_volume):
    m, vol, tf, lf = _make(sphere_volume, camera_grads=True)
    lf.requires_grad_(True)
    (m(vol, tf, lf) ** 2).mean().backward()
    assert lf.grad is not None and np.all(np.isfinite(lf.grad.numpy()))
    rc = Raycaster(vol.shape[1:], (6, 6), 16, sampling_rate=0.5,
                   jitter=False, max_samples=64, block_size=8)
    gl = jax.grad(lambda l: jnp.mean(rc.forward(
        jnp.asarray(vol.numpy()), jnp.asarray(tf.numpy()), l) ** 2))(
        jnp.asarray(lf.detach().numpy()))
    np.testing.assert_allclose(lf.grad.numpy(), np.asarray(gl),
                               atol=1e-5, rtol=1e-4)


def test_camera_grads_rejects_tiled_vjp(sphere_volume):
    """'tiled' still drops position cotangents; 'sorted' accepts since
    round 5 (exact camera grads via sampling._position_cotangents)."""
    vol_user, _, _ = _inputs(sphere_volume)
    with pytest.raises(ValueError, match="march_vjp"):
        TorchRaycaster(vol_user.shape[1:], (6, 6), 16, jitter=False,
                       camera_grads=True, march_vjp="tiled",
                       march_table="super64")


def test_camera_grads_sorted_matches_ad(sphere_volume):
    """Sorted-VJP camera grads through the torch bridge == the AD path's
    (same loss, march_vjp the only difference)."""
    m_ad, vol, tf, lf = _make(sphere_volume, camera_grads=True)
    lf.requires_grad_(True)
    (m_ad(vol, tf, lf) ** 2).mean().backward()
    g_ad = lf.grad.numpy().copy()

    m_s, _, _, _ = _make(sphere_volume, camera_grads=True,
                         march_vjp="sorted", march_table="super64")
    lf2 = lf.detach().clone().requires_grad_(True)
    (m_s(vol.detach(), tf.detach(), lf2) ** 2).mean().backward()
    np.testing.assert_allclose(lf2.grad.numpy(), g_ad,
                               atol=1e-5, rtol=1e-3)


def test_batched_forward_and_grads(sphere_volume):
    """'Anything batched => everything batched', grads land with the
    ORIGINAL (unbatched) input shapes through the broadcast."""
    m, vol, tf, lf = _make(sphere_volume)
    lfs = torch.tensor([[1.2, 0.8, 2.0], [-1.0, 0.4, 2.1]])
    vol.requires_grad_(True)
    img = m(vol, tf, lfs)
    assert img.shape == (2, 4, 6, 6)
    for k in range(2):
        single = m(vol.detach(), tf, lfs[k])
        np.testing.assert_allclose(img[k].detach().numpy(), single.numpy(),
                                   atol=1e-5)
    img.square().mean().backward()
    assert vol.grad.shape == vol.shape
    assert np.isfinite(vol.grad.numpy()).all()


def test_jitter_key_replay(sphere_volume):
    """Jittered backward replays the forward's key: grads equal jax.grad
    with that exact key (the reference re-jitters with fresh RNG, making
    its stochastic grads inconsistent — SURVEY §2.6)."""
    m, vol, tf, lf = _make(sphere_volume, jitter=True, seed=7)
    vol.requires_grad_(True)
    img = m(vol, tf, lf)
    key = m._last_key
    img.square().mean().backward()

    rc = Raycaster(vol.shape[1:], (6, 6), 16, sampling_rate=0.5,
                   jitter=True, max_samples=64, block_size=8)
    gv = jax.grad(lambda v: jnp.mean(rc.forward(
        v, jnp.asarray(tf.numpy()), jnp.asarray(lf.numpy()),
        key=key) ** 2))(jnp.asarray(vol.detach().numpy()))
    np.testing.assert_allclose(vol.grad.numpy(), np.asarray(gv),
                               atol=1e-6, rtol=1e-4)


def test_raycast_nondiff(sphere_volume):
    m, vol, tf, lf = _make(sphere_volume)
    img = m.raycast_nondiff(vol, tf, lf, sampling_rate=2.0)
    assert img.shape == (4, 6, 6) and not img.requires_grad
    rc = Raycaster(vol.shape[1:], (6, 6), 16, sampling_rate=0.5,
                   jitter=False, max_samples=64, block_size=8)
    want = rc.raycast_nondiff(jnp.asarray(vol.numpy()),
                              jnp.asarray(tf.numpy()),
                              jnp.asarray(lf.numpy()), sampling_rate=2.0)
    np.testing.assert_allclose(img.numpy(), np.asarray(want), atol=1e-6)


def test_torch_optimizer_step(sphere_volume):
    """End-to-end torch training loop: TF optimization with torch Adam
    decreases the loss (the reference's core workflow,
    `/root/reference/examples/test_opt_tf.py`)."""
    m, vol, tf, lf = _make(sphere_volume)
    with torch.no_grad():
        target = m(vol, tf, lf)
    tf0 = torch.full_like(tf, 0.3).requires_grad_(True)
    opt = torch.optim.Adam([tf0], lr=0.05)
    losses = []
    for _ in range(5):
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(m(vol, tf0, lf), target)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert losses[-1] < losses[0]
