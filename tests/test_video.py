"""MJPEG-AVI writer (differender_tpu.video): container structure + frame
decodability."""
import struct

import numpy as np
import pytest

from differender_tpu.video import VideoWriter, save_video


def _frames(n=6, h=32, w=48):
    # Smooth gradients (JPEG-friendly; noise frames would decode with
    # large quantization error and prove nothing about the container).
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    return [np.stack([xx, yy, np.full_like(xx, i / n)], -1)
            .astype(np.float32) for i in range(n)]


def test_writes_valid_riff_avi(tmp_path):
    p = str(tmp_path / "clip.avi")
    save_video(_frames(), p, fps=12)
    with open(p, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF"
    assert data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data and b"movi" in data and b"idx1" in data
    # frame count in avih
    avih_at = data.index(b"avih") + 8
    n_frames = struct.unpack("<I", data[avih_at + 16:avih_at + 20])[0]
    assert n_frames == 6


def test_frames_decode_back(tmp_path):
    from PIL import Image
    import io as _io
    p = str(tmp_path / "clip2.avi")
    frames = _frames(3)
    save_video(frames, p, quality=95)
    with open(p, "rb") as f:
        data = f.read()
    # pull each 00dc chunk and decode the JPEG
    pos, found = 0, 0
    while True:
        pos = data.find(b"00dc", pos)
        if pos < 0:
            break
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        payload = data[pos + 8:pos + 8 + size]
        if payload[:2] == b"\xff\xd8":      # JPEG SOI (skip idx1 entries)
            img = np.asarray(Image.open(_io.BytesIO(payload)))
            assert img.shape == (32, 48, 3)
            ref = (np.clip(frames[found], 0, 1) * 255 + 0.5).astype(np.uint8)
            assert np.mean(np.abs(img.astype(int) - ref.astype(int))) < 8
            found += 1
        pos += 8 + size
    assert found == 3


def test_context_manager_and_validation(tmp_path):
    p = str(tmp_path / "clip3")
    with VideoWriter(p, fps=10) as vw:
        vw.write_frame(np.zeros((16, 16, 4), np.float32))
        with pytest.raises(ValueError):
            vw.write_frame(np.zeros((8, 8, 3), np.float32))
        vw.write_frame(np.ones((16, 16, 3)) * 0.5)
    assert vw.path.endswith(".avi")
    with open(vw.path, "rb") as f:
        assert f.read(4) == b"RIFF"
    with pytest.raises(ValueError):
        VideoWriter(str(tmp_path / "x.avi")).close()
