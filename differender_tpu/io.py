"""Volume IO and checkpointing.

* :func:`load_raw_volume` — raw binary volume reader replicating the
  reference's skull.raw loading: uint8, axes 0<->1 swapped, /255
  (`/root/reference/examples/taichi_volume_raycaster.py:548-550`).
  A native (C++) fast path is used when the ``_voliox`` extension is built
  (see ``native/``); the NumPy path is the always-available fallback.
* :func:`save_checkpoint` / :func:`load_checkpoint` — persistence of an
  optimization-state pytree (volume, TF, optimizer state, PRNG key), the
  checkpoint/resume subsystem the reference lacks (SURVEY §5).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import numpy as np

try:                                   # optional native fast path
    from . import _voliox              # type: ignore
except ImportError:
    _voliox = None


def load_raw_volume(path: str, shape: Tuple[int, int, int],
                    dtype=np.uint8, swap_axes=(0, 1),
                    normalize: bool = True) -> np.ndarray:
    """Read a raw binary volume.

    Defaults replicate the reference's skull.raw recipe
    (`/root/reference/examples/taichi_volume_raycaster.py:548-550`):
    uint8 -> reshape -> swapaxes(0, 1) -> float32 / 255.
    """
    if _voliox is not None and np.dtype(dtype) == np.uint8 and normalize:
        buf = _voliox.load_u8_normalized(path, int(np.prod(shape)))
        vol = np.frombuffer(buf, dtype=np.float32).reshape(shape)
    else:
        raw = np.fromfile(path, dtype=dtype)
        if raw.size != int(np.prod(shape)):
            raise ValueError(
                f"{path}: expected {int(np.prod(shape))} voxels for shape "
                f"{shape}, got {raw.size}")
        vol = raw.reshape(shape).astype(np.float32)
        if normalize:
            info = np.iinfo(dtype) if np.issubdtype(np.dtype(dtype), np.integer) else None
            vol = vol / (info.max if info else 1.0)
    if swap_axes is not None:
        vol = np.swapaxes(vol, *swap_axes)
    return np.ascontiguousarray(vol)


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Serialize an optimization-state pytree (arrays as numpy).

    The state is everything needed to resume: parameters (volume/TF),
    optimizer state, PRNG key, step counter.
    """
    import jax
    payload = {
        "step": step,
        "state": jax.tree.map(lambda x: np.asarray(x), state),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)              # atomic on POSIX


def load_checkpoint(path: str):
    """Returns (state_pytree_of_numpy, step)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload["step"]
