import gzip

import numpy as np
import pytest

from segmantic_tpu import native
from segmantic_tpu.core.volume import Volume
from segmantic_tpu.io.nifti import read_volume, write_volume

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_parallel_gzip_roundtrip():
    from segmantic_tpu.io import zturbo

    rng = np.random.default_rng(0)
    # > 4MB so multiple members are produced
    data = rng.integers(0, 50, 9_000_000).astype(np.uint8).tobytes()
    compressed = zturbo.compress(data)
    assert len(compressed) < len(data)
    assert compressed[:2] == b"\x1f\x8b"
    # our decoder
    assert zturbo.decompress(compressed) == data
    # stdlib gzip handles multi-member streams too
    assert gzip.decompress(compressed) == data


def test_nifti_gz_uses_parallel_codec(tmp_path):
    rng = np.random.default_rng(1)
    vol = Volume(data=rng.standard_normal((1, 64, 64, 64)).astype(np.float32))
    p = tmp_path / "big.nii.gz"
    write_volume(p, vol)
    back = read_volume(p)
    np.testing.assert_array_equal(back.numpy(), vol.numpy())


def test_empty_and_small_inputs():
    from segmantic_tpu.io import zturbo

    assert zturbo.decompress(zturbo.compress(b"")) == b""
    assert zturbo.decompress(zturbo.compress(b"x")) == b"x"
