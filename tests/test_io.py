import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from differender_tpu.io import (load_raw_volume, save_checkpoint,
                                load_checkpoint, _voliox)


def test_load_raw_volume_matches_reference_recipe(tmp_path):
    """uint8 -> reshape -> swapaxes(0,1) -> /255
    (`/root/reference/examples/taichi_volume_raycaster.py:548-550`)."""
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=8 * 9 * 10, dtype=np.uint8)
    p = tmp_path / "vol.raw"
    p.write_bytes(data.tobytes())
    vol = load_raw_volume(str(p), (8, 9, 10))
    want = np.swapaxes(data.reshape(8, 9, 10).astype(np.float32) / 255.0, 0, 1)
    np.testing.assert_allclose(vol, want)
    assert vol.flags["C_CONTIGUOUS"]


def test_load_raw_volume_uint16_python_path(tmp_path):
    data = np.arange(4 * 4 * 4, dtype=np.uint16)
    p = tmp_path / "v16.raw"
    p.write_bytes(data.tobytes())
    vol = load_raw_volume(str(p), (4, 4, 4), dtype=np.uint16, swap_axes=None)
    np.testing.assert_allclose(
        vol, data.reshape(4, 4, 4).astype(np.float32) / 65535.0)


def test_load_raw_volume_size_mismatch(tmp_path):
    p = tmp_path / "short.raw"
    p.write_bytes(b"\x00" * 10)
    with pytest.raises(ValueError):
        load_raw_volume(str(p), (4, 4, 4))


def test_native_extension_available():
    # the build is part of the repo's setup; exercise the C++ path directly
    if _voliox is None:
        pytest.skip("native extension not built")
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(bytes(range(10)))
        path = f.name
    try:
        buf = _voliox.load_u8_normalized(path, 10)
        vals = np.frombuffer(buf, np.float32)
        np.testing.assert_allclose(vals, np.arange(10) / 255.0)
        with pytest.raises(ValueError):
            _voliox.load_u8_normalized(path, 11)
    finally:
        os.unlink(path)


def test_checkpoint_roundtrip(tmp_path):
    state = {"volume": jnp.ones((4, 4, 4)), "tf": jnp.zeros((8, 4)),
             "nested": {"count": jnp.asarray(7)}}
    p = str(tmp_path / "ckpt.pkl")
    save_checkpoint(p, state, step=42)
    loaded, step = load_checkpoint(p)
    assert step == 42
    np.testing.assert_array_equal(loaded["volume"], np.ones((4, 4, 4)))
    assert int(loaded["nested"]["count"]) == 7
