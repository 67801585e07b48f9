"""Camera-path helpers (`/root/reference/differender/utils/utils.py:80-90`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def in_circles(i, y: float = 0.7, dist: float = 2.5) -> Array:
    """Camera position on a horizontal orbit:
    ``(cos(i)*dist, y, sin(i)*dist)``
    (`/root/reference/differender/utils/utils.py:80-83`)."""
    i = jnp.asarray(i, jnp.float32)
    return jnp.stack([jnp.cos(i) * dist,
                      jnp.full_like(i, y),
                      jnp.sin(i) * dist], axis=-1)


def get_rand_pos(key: Array, bs: int | None = None, dist: float = 2.7) -> Array:
    """Random camera position(s) uniform on a sphere of radius ``dist``
    (normalized Gaussians, `/root/reference/differender/utils/utils.py:86-90`).
    Shape (3,) or (bs, 3)."""
    shape = (3,) if bs is None else (bs, 3)
    v = jax.random.normal(key, shape, jnp.float32)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True) * dist
