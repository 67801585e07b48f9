"""Multi-view data parallelism.

Replaces the reference's serialized per-view host loop
(`/root/reference/differender/volume_raycaster.py:418-427`) with SPMD over a
device mesh: views are sharded along a mesh axis, the volume and transfer
function are replicated, and gradient reduction across views rides the ICI
as the transpose of the replication (an implicit ``psum``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..render import render

Array = jax.Array


def render_views(
    volume: Array,
    tf: Array,
    look_froms: Array,            # (B, 3)
    config: RenderConfig,
    mesh: Mesh,
    sampling_rate: Optional[float] = None,
    keys: Optional[Array] = None,  # (B,) PRNG keys or None
    axis: str = "views",
) -> Array:
    """Render B views data-parallel over ``mesh[axis]``.

    Returns (B, H, W, 4) images, sharded along the batch dimension.
    B must be divisible by the mesh axis size.
    """
    def one(lf, key):
        return render(volume, tf, lf, config, sampling_rate, key=key).image

    batched = jax.vmap(one, in_axes=(0, 0 if keys is not None else None))
    fn = jax.jit(
        batched,
        in_shardings=(NamedSharding(mesh, P(axis)),
                      NamedSharding(mesh, P(axis)) if keys is not None else None),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(look_froms, keys)


def view_parallel_grads(
    loss_fn,
    volume: Array,
    tf: Array,
    look_froms: Array,
    targets: Array,
    config: RenderConfig,
    mesh: Mesh,
    sampling_rate: Optional[float] = None,
    keys: Optional[Array] = None,
    axis: str = "views",
):
    """One data-parallel fwd+bwd: mean of ``loss_fn(image, target)`` over a
    sharded view batch; returns (loss, (d_volume, d_tf)) with the gradient
    reduction across views performed by XLA collectives.

    ``loss_fn`` maps ((H, W, 4), target) -> scalar.
    """

    def total_loss(vol, tf_, lfs, tgts, ks):
        def one(lf, tgt, key):
            img = render(vol, tf_, lf, config, sampling_rate, key=key).image
            return loss_fn(img, tgt)

        losses = jax.vmap(one, in_axes=(0, 0, 0 if ks is not None else None))(
            lfs, tgts, ks)
        return jnp.mean(losses)

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        jax.value_and_grad(total_loss, argnums=(0, 1)),
        in_shardings=(rep, rep, shd, shd, shd if keys is not None else None),
        out_shardings=(rep, (rep, rep)),
    )
    return fn(volume, tf, look_froms, targets, keys)
