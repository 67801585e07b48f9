"""Optimizers and gradient hygiene.

* :func:`tf_momentum` — an ``optax`` transform replicating the reference's
  bespoke on-device TF optimizer kernel ``apply_grad``
  (`/root/reference/examples/taichi_volume_raycaster.py:375-381`):
      ``mom <- gamma * mom + lr * clamp(grad, -max_grad, +max_grad)``
      ``tf  <- max(tf - mom, 0)``
  The clamp-at-zero projection is exposed separately (optax transforms are
  additive) via :func:`project_nonneg` / :func:`project_unit`.
* :func:`nan_to_num_grads` — the reference scrubs every outgoing gradient
  with ``torch.nan_to_num``
  (`/root/reference/differender/volume_raycaster.py:463-464,474-475`); this
  is the pytree equivalent, opt-in.
* :func:`value_and_clean_grad` — convenience wrapper pairing ``jax.grad``
  with the scrub.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TFMomentumState(NamedTuple):
    momentum: Any
    step: Any


def tf_momentum(lr: float = 0.1, gamma: float = 0.9, max_grad: float = 0.1,
                lr_decay: float = 0.99) -> optax.GradientTransformation:
    """Momentum + value-clipped updates with exponential LR decay.

    Matches the standalone example's driver loop: per iteration
    ``apply_grad(lr, mom, clip)`` then ``lr *= lr_decay``
    (`/root/reference/examples/taichi_volume_raycaster.py:596-601`).
    Combine with :func:`project_nonneg` after ``optax.apply_updates`` to get
    the kernel's trailing ``max(tf - mom, 0)``.
    """

    def init_fn(params):
        return TFMomentumState(
            momentum=jax.tree.map(jnp.zeros_like, params),
            step=jnp.zeros([], jnp.int32),
        )

    def update_fn(grads, state, params=None):
        del params
        cur_lr = lr * jnp.power(lr_decay, state.step.astype(jnp.float32))
        new_mom = jax.tree.map(
            lambda m, g: gamma * m + cur_lr * jnp.clip(g, -max_grad, max_grad),
            state.momentum, grads)
        updates = jax.tree.map(lambda m: -m, new_mom)
        return updates, TFMomentumState(momentum=new_mom, step=state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def project_nonneg(params):
    """``max(., 0)`` projection (reference ``apply_grad``'s ``ti.max(..., 0)``,
    `/root/reference/examples/taichi_volume_raycaster.py:380`)."""
    return jax.tree.map(lambda p: jnp.maximum(p, 0.0), params)


def project_unit(params):
    """Clamp to [0, 1] — the post-step clamp of the volume-optimization loop
    (`/root/reference/examples/test_opt_tf.py:86-88`)."""
    return jax.tree.map(lambda p: jnp.clip(p, 0.0, 1.0), params)


def nan_to_num_grads(grads):
    """NaN/Inf scrub of a gradient pytree
    (`/root/reference/differender/volume_raycaster.py:463-464`)."""
    return jax.tree.map(jnp.nan_to_num, grads)


def value_and_clean_grad(fn: Callable, argnums=0, has_aux: bool = False):
    """``jax.value_and_grad`` with reference-style NaN scrubbing applied to
    the gradients."""
    vg = jax.value_and_grad(fn, argnums=argnums, has_aux=has_aux)

    def wrapped(*args, **kwargs):
        val, grads = vg(*args, **kwargs)
        return val, nan_to_num_grads(grads)

    return wrapped


def adamw_onecycle(max_lr: float, total_steps: int,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """AdamW + OneCycle schedule, replicating the volume inverse-rendering
    optimizer setup (`/root/reference/examples/test_opt_tf.py:55-56`)."""
    if int(0.3 * total_steps) < 1:
        # optax's onecycle warmup length is int(pct_start*total): a zero-step
        # warmup divides by zero and yields NaN learning rates.
        raise ValueError(
            f"total_steps={total_steps} too small for a OneCycle schedule "
            "(needs >= 4 so the warmup phase is at least one step)")
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr)
    return optax.adamw(schedule, weight_decay=weight_decay)
