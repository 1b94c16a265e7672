import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import read_nifti, read_volume, write_nifti, write_volume


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.uint16, np.int32, np.float32, np.float64]
)
def test_roundtrip_dtypes(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.standard_normal((7, 6, 5)).astype(dtype)
    else:
        data = rng.integers(0, 100, size=(7, 6, 5)).astype(dtype)
    affine = affine_from_spacing_origin((0.5, 0.6, 0.7), (1.0, -2.0, 3.0))
    path = tmp_path / f"vol{suffix}"
    write_nifti(path, data, affine)
    out, aff = read_nifti(path)
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, data)
    np.testing.assert_allclose(aff, affine, atol=1e-5)


def test_roundtrip_direction_matrix(tmp_path):
    # non-axis-aligned affine survives the sform roundtrip
    theta = 0.3
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    affine = np.eye(4)
    affine[:3, :3] = rot * np.array([1.0, 1.5, 2.0])[None, :]
    affine[:3, 3] = [5.0, -7.0, 2.5]
    data = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "rot.nii.gz"
    write_nifti(path, data, affine)
    out, aff = read_nifti(path)
    np.testing.assert_allclose(aff, affine, atol=1e-5)
    np.testing.assert_array_equal(out, data)


def test_volume_roundtrip(tmp_path):
    data = np.random.default_rng(1).standard_normal((1, 4, 5, 6)).astype(np.float32)
    vol = Volume(data=data, affine=affine_from_spacing_origin((1, 2, 3)))
    p = tmp_path / "v.nii.gz"
    write_volume(p, vol)
    back = read_volume(p)
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_allclose(back.spacing, [1, 2, 3], atol=1e-6)
    assert back.meta["filename"] == str(p)


def test_multichannel_roundtrip(tmp_path):
    data = np.random.default_rng(2).standard_normal((3, 4, 5, 6)).astype(np.float32)
    vol = Volume(data=data)
    p = tmp_path / "mc.nii"
    write_volume(p, vol)
    back = read_volume(p)
    assert back.data.shape == (3, 4, 5, 6)
    np.testing.assert_array_equal(back.data, data)


def test_2d_roundtrip(tmp_path):
    data = np.random.default_rng(3).integers(0, 5, size=(8, 9)).astype(np.uint8)
    p = tmp_path / "slice.nii.gz"
    write_nifti(p, data)
    out, _ = read_nifti(p)
    np.testing.assert_array_equal(out, data)


def test_big_endian_read(tmp_path):
    # hand-craft a big-endian header to exercise byte-swap path
    import struct

    data = np.arange(24, dtype=">i2").reshape(2, 3, 4)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)  # int16
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">8f", hdr, 76, 1, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into(">f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + b"\x00" * 4 + np.asfortranarray(data).tobytes(order="F")
    p = tmp_path / "be.nii"
    p.write_bytes(payload)
    out, _ = read_nifti(p)
    np.testing.assert_array_equal(out, data.astype("<i2"))


def test_gz_write_falls_back_without_native(tmp_path, monkeypatch):
    """When the native parallel-gzip lib is absent, .nii.gz writes must
    fall back to stdlib gzip and stay byte-valid / round-trippable."""
    from segmantic_tpu import native as _native

    def _no_lib():
        raise ImportError("native library not built (simulated)")

    monkeypatch.setattr(_native, "_load", _no_lib)
    rng = np.random.default_rng(7)
    vol = Volume(data=rng.standard_normal((1, 9, 8, 7)).astype(np.float32))
    p = tmp_path / "fallback.nii.gz"
    write_volume(p, vol)
    assert p.read_bytes()[:2] == b"\x1f\x8b"
    back = read_volume(p)
    np.testing.assert_array_equal(back.numpy(), vol.numpy())
