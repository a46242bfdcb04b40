"""EXR I/O round-trip tests (reference: bitmap.cpp EXR paths)."""

import numpy as np

from gvpm_tpu.utils import exr


def test_roundtrip_exact(tmp_path):
    img = np.random.RandomState(0).rand(7, 13, 3).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    back = exr.read_exr(p)
    assert back.shape == img.shape
    np.testing.assert_array_equal(back, img)


def test_roundtrip_negative_and_large(tmp_path):
    img = np.array([[[-1.5, 0.0, 1e8]]], np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    np.testing.assert_array_equal(exr.read_exr(p), img)


def test_grayscale_input(tmp_path):
    img = np.random.RandomState(1).rand(4, 5).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    back = exr.read_exr(p)
    for c in range(3):
        np.testing.assert_array_equal(back[..., c], img)


def test_magic_and_version(tmp_path):
    import struct
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, np.zeros((2, 2, 3), np.float32))
    with open(p, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
    assert magic == 20000630 and version == 2
