import numpy as np
import jax.numpy as jnp
import optax

from differender_tpu.optim import (tf_momentum, project_nonneg, project_unit,
                                   adamw_onecycle)


def test_tf_momentum_matches_reference_kernel():
    """Replay the reference momentum update
    (`/root/reference/examples/taichi_volume_raycaster.py:375-381` with the
    driver's lr decay `:601`) against the optax transform."""
    lr, gamma, clip, decay = 0.1, 0.9, 0.05, 0.99
    rng = np.random.default_rng(0)
    tf = rng.random((16, 4)).astype(np.float32)
    grads = [rng.normal(0, 0.2, (16, 4)).astype(np.float32) for _ in range(5)]

    # manual reference loop
    tf_ref = tf.copy()
    mom = np.zeros_like(tf_ref)
    cur_lr = lr
    for g in grads:
        mom = gamma * mom + cur_lr * np.clip(g, -clip, clip)
        tf_ref = np.maximum(tf_ref - mom, 0.0)
        cur_lr *= decay

    # optax transform + projection
    opt = tf_momentum(lr=lr, gamma=gamma, max_grad=clip, lr_decay=decay)
    params = jnp.asarray(tf)
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state)
        params = project_nonneg(optax.apply_updates(params, updates))

    np.testing.assert_allclose(np.asarray(params), tf_ref, atol=1e-6)


def test_projections():
    p = jnp.asarray(np.array([-0.5, 0.2, 1.7], np.float32))
    np.testing.assert_allclose(np.asarray(project_nonneg(p)), [0.0, 0.2, 1.7])
    np.testing.assert_allclose(np.asarray(project_unit(p)), [0.0, 0.2, 1.0])


def test_adamw_onecycle_decreases_loss():
    opt = adamw_onecycle(max_lr=0.05, total_steps=50)
    target = jnp.asarray(np.linspace(0, 1, 16, dtype=np.float32))
    params = jnp.zeros(16)
    state = opt.init(params)
    import jax

    def loss(p):
        return jnp.mean((p - target) ** 2)

    l0 = float(loss(params))
    for _ in range(50):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < 0.1 * l0


def test_adamw_onecycle_rejects_tiny_total_steps():
    import pytest
    with pytest.raises(ValueError):
        adamw_onecycle(max_lr=1e-3, total_steps=3)
