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


class TestNifti:
    """load_nifti: dependency-free NIfTI-1 parsing (both endiannesses,
    gz, slope/inter, Fortran order)."""

    @staticmethod
    def _make_nifti(vol, end="<", datatype=16, slope=1.0, inter=0.0,
                    gz=False, path="/tmp/test_vol.nii"):
        import gzip
        import numpy as np
        hdr = bytearray(352)
        hdr[0:4] = np.array([348], f"{end}i4").tobytes()
        dim = np.zeros(8, f"{end}i2")
        dim[0] = 3
        dim[1:4] = vol.shape
        hdr[40:56] = dim.tobytes()
        hdr[70:72] = np.array([datatype], f"{end}i2").tobytes()
        hdr[108:112] = np.array([352.0], f"{end}f4").tobytes()
        hdr[112:116] = np.array([slope], f"{end}f4").tobytes()
        hdr[116:120] = np.array([inter], f"{end}f4").tobytes()
        hdr[344:348] = b"n+1\x00"
        dt = {2: np.uint8, 4: np.int16, 16: np.float32}[datatype]
        body = np.asfortranarray(vol.astype(dt)).tobytes(order="F")
        blob = bytes(hdr) + body
        if gz:
            path += ".gz"
            with gzip.open(path, "wb") as f:
                f.write(blob)
        else:
            with open(path, "wb") as f:
                f.write(blob)
        return path

    def test_roundtrip_float32(self, rng, tmp_path):
        from differender_tpu.io import load_nifti
        vol = rng.random((7, 5, 3)).astype(np.float32)
        p = self._make_nifti(vol, path=str(tmp_path / "a.nii"))
        out = load_nifti(p, normalize=False)
        np.testing.assert_allclose(out, vol, atol=0)
        assert out.flags["C_CONTIGUOUS"]

    def test_big_endian_and_gz(self, rng, tmp_path):
        from differender_tpu.io import load_nifti
        vol = (rng.random((6, 4, 5)) * 255).astype(np.uint8)
        p = self._make_nifti(vol, end=">", datatype=2, gz=True,
                             path=str(tmp_path / "b.nii"))
        out = load_nifti(p, normalize=False)
        np.testing.assert_allclose(out, vol.astype(np.float32), atol=0)

    def test_slope_inter_and_normalize(self, rng, tmp_path):
        from differender_tpu.io import load_nifti
        vol = (rng.random((4, 4, 4)) * 1000 - 200).astype(np.int16)
        p = self._make_nifti(vol, datatype=4, slope=0.5, inter=-10.0,
                             path=str(tmp_path / "c.nii"))
        out = load_nifti(p, normalize=False)
        np.testing.assert_allclose(out, vol * 0.5 - 10.0, rtol=1e-6)
        outn = load_nifti(p, normalize=True)
        assert abs(float(outn.min())) < 1e-7 and abs(float(outn.max()) - 1.0) < 1e-7

    def test_rejects_garbage(self, tmp_path):
        import pytest
        from differender_tpu.io import load_nifti
        p = str(tmp_path / "bad.nii")
        with open(p, "wb") as f:
            f.write(b"\x00" * 400)
        with pytest.raises(ValueError):
            load_nifti(p)
