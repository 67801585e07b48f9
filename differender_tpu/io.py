"""Volume IO and checkpointing.

* :func:`load_raw_volume` — raw binary volume reader replicating the
  reference's skull.raw loading: uint8, axes 0<->1 swapped, /255
  (`/root/reference/examples/taichi_volume_raycaster.py:548-550`).
  A native (C++) fast path is used when the ``_voliox`` extension is built
  (see ``native/``); the NumPy path is the always-available fallback.
* :func:`load_nifti` — dependency-free NIfTI-1 reader (.nii / .nii.gz)
  for medical volumes: the reference's flagship data is the CQ500 CT set
  pulled through ``torchvtk.datasets.TorchDataset``
  (`/root/reference/examples/render_nondiff.py:16-20`); torchvtk's
  preprocessed binaries are not obtainable, so this reads the standard
  interchange format those datasets ship in.
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


# NIfTI-1 datatype codes -> numpy dtypes (the common subset).
_NIFTI_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32,
}


def load_nifti(path: str, normalize: bool = True) -> np.ndarray:
    """Read a NIfTI-1 volume (.nii or .nii.gz) into float32 (X, Y, Z).

    Pure NumPy (no nibabel): parses the 348-byte header (either
    endianness), applies the ``scl_slope``/``scl_inter`` intensity
    transform, and — with ``normalize`` — min-max scales to [0, 1], the
    range the renderer's transfer functions are defined over (the
    reference's CT volumes arrive already normalized through torchvtk).
    4D files with a single trailing frame are squeezed.
    """
    import gzip
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    if len(data) < 352:
        raise ValueError(f"{path}: too small for a NIfTI-1 header")
    for end in ("<", ">"):
        if int(np.frombuffer(data, f"{end}i4", 1, 0)[0]) == 348:
            break
    else:
        raise ValueError(f"{path}: bad sizeof_hdr (not NIfTI-1)")
    magic = data[344:348]
    if magic[:3] == b"ni1":
        raise ValueError(
            f"{path}: detached-header NIfTI (.hdr/.img pair, magic 'ni1') "
            "— voxels live in the sibling .img file; convert to a "
            "single-file .nii or pass the data through load_raw_volume")
    if magic[:3] != b"n+1":
        raise ValueError(f"{path}: bad NIfTI magic {magic!r}")
    dim = np.frombuffer(data, f"{end}i2", 8, 40)
    ndim = int(dim[0])
    shape = tuple(int(d) for d in dim[1:1 + ndim])
    datatype = int(np.frombuffer(data, f"{end}i2", 1, 70)[0])
    if datatype not in _NIFTI_DTYPES:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    dt = np.dtype(_NIFTI_DTYPES[datatype]).newbyteorder(end)
    vox_offset = int(np.frombuffer(data, f"{end}f4", 1, 108)[0])
    scl_slope = float(np.frombuffer(data, f"{end}f4", 1, 112)[0])
    scl_inter = float(np.frombuffer(data, f"{end}f4", 1, 116)[0])
    n = int(np.prod(shape))
    vol = np.frombuffer(data, dt, n, vox_offset).astype(np.float32)
    # NIfTI data is Fortran-ordered (x fastest).
    vol = vol.reshape(shape, order="F")
    while vol.ndim > 3 and vol.shape[-1] == 1:
        vol = vol[..., 0]
    if vol.ndim != 3:
        raise ValueError(f"{path}: expected a 3D volume, got shape {shape}")
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        vol = vol * slope + scl_inter
    if normalize:
        lo, hi = float(vol.min()), float(vol.max())
        vol = (vol - lo) / (hi - lo) if hi > lo else np.zeros_like(vol)
    return np.ascontiguousarray(vol, dtype=np.float32)


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
