"""Native batched cropper: equality with the pure-numpy path.

Pins the C++ crop_patches_3d (zero pad + channel-last transpose + dtype
cast, uint8 or int32 label input, caller-provided output slices) against
_crop_with_pad — the two paths must be bit-identical so _native_ok can
route freely. Host-side analogue of the reference's CacheDataset +
RandCropByLabelClasses (reference: src/segmantic/seg/monai_unet.py:264-290).
"""

from __future__ import annotations

import numpy as np
import pytest

from segmantic_tpu import native
from segmantic_tpu.data.cache import _crop_with_pad

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _reference(img, lbl, starts, out_size, to_bf16):
    import ml_dtypes

    imgs = np.stack([_crop_with_pad(img, s, out_size) for s in starts])
    imgs = np.moveaxis(imgs, 1, -1)
    if to_bf16:
        imgs = imgs.astype(ml_dtypes.bfloat16)
    lbls = np.stack(
        [_crop_with_pad(lbl[None], s, out_size)[0] for s in starts]
    ).astype(np.uint8)
    return imgs, lbls


@pytest.mark.parametrize("to_bf16", [False, True])
@pytest.mark.parametrize("lbl_dtype", [np.uint8, np.int32])
def test_native_matches_numpy(to_bf16, lbl_dtype):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 20, 18, 17)).astype(np.float32)
    lbl = rng.integers(0, 5, (20, 18, 17)).astype(lbl_dtype)
    # in-bounds, straddling, and fully-out-of-bounds windows
    starts = np.asarray(
        [[0, 0, 0], [5, 4, 3], [-3, -2, -1], [15, 14, 13], [40, 40, 40]],
        np.int64,
    )
    out_size = (8, 8, 8)

    got_i, got_l = native.crop_patches_3d(
        img, lbl, starts, out_size, to_bf16=to_bf16
    )
    ref_i, ref_l = _reference(img, lbl, starts, out_size, to_bf16)
    np.testing.assert_array_equal(np.asarray(got_i, np.float32),
                                  np.asarray(ref_i, np.float32))
    np.testing.assert_array_equal(got_l, ref_l)


def test_out_slices_assemble_in_place():
    import ml_dtypes

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
    lbl = rng.integers(0, 3, (16, 16, 16)).astype(np.uint8)
    out_size = (8, 8, 8)
    starts = np.asarray([[0, 0, 0], [2, 2, 2], [4, 4, 4]], np.int64)

    img_out = np.empty((3,) + out_size + (1,), ml_dtypes.bfloat16)
    lbl_out = np.empty((3,) + out_size, np.uint8)
    # write runs [0:2] and [2:3] through caller slices
    native.crop_patches_3d(img, lbl, starts[:2], out_size, to_bf16=True,
                           out=(img_out[0:2], lbl_out[0:2]))
    native.crop_patches_3d(img, lbl, starts[2:], out_size, to_bf16=True,
                           out=(img_out[2:3], lbl_out[2:3]))
    ref_i, ref_l = _reference(img, lbl, starts, out_size, True)
    np.testing.assert_array_equal(np.asarray(img_out, np.float32),
                                  np.asarray(ref_i, np.float32))
    np.testing.assert_array_equal(lbl_out, ref_l)
