"""End-to-end test of the applied-ops inversion: preprocess a volume, fake a
prediction on the preprocessed grid, invert, and check it lands back on the
original grid with the original geometry."""

import numpy as np

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.transforms import post as P
from segmantic_tpu.transforms import spatial as S
from segmantic_tpu.transforms.base import Compose


def test_invert_roundtrip():
    rng = np.random.default_rng(0)
    shape = (20, 18, 16)
    img = rng.standard_normal((1,) + shape).astype(np.float32)
    lbl = np.zeros((1,) + shape, dtype=np.int32)
    lbl[0, 5:15, 4:14, 3:13] = 1

    # LPS-ish affine to exercise orientation inversion
    aff = affine_from_spacing_origin((1.0, 1.5, 2.0), (5, 6, 7))
    aff[0, 0] *= -1
    aff[1, 1] *= -1

    sample = {
        "image": Volume(data=img, affine=aff),
        "label": Volume(data=lbl, affine=aff.copy()),
    }

    pre = Compose(
        [
            S.Orientationd(keys=["image", "label"]),
            S.NormalizeIntensityd(keys="image"),
            S.CropForegroundd(keys=["image", "label"], source_key="label"),
            S.Spacingd(keys=["image", "label"], pixdim=(1.2, 1.2, 1.2)),
        ]
    )
    out = pre(sample)

    # prediction == preprocessed label (prefect model), same grid as image
    pred = out["label"].with_data(out["label"].numpy().astype(np.float32))
    pred.applied_ops = []
    out["pred"] = pred

    inv = P.Invertd(keys="pred", ref_key="image", nearest=True)(out)
    restored = inv["pred"]

    assert restored.spatial_shape == shape
    np.testing.assert_allclose(restored.affine, aff, atol=1e-9)

    # nearest-inverted prediction should agree with original label on most voxels
    agree = (restored.numpy().astype(np.int32) == lbl).mean()
    assert agree > 0.97, agree


def test_invert_pad_crop_only():
    img = np.zeros((1, 5, 6, 7), dtype=np.float32)
    img[0, 2, 3, 4] = 1.0
    vol = Volume(data=img)
    sample = {"image": vol, "label": vol.with_data(img.astype(np.int32))}
    pre = Compose(
        [
            S.CropForegroundd(keys=["image", "label"], source_key="label"),
            S.SpatialPadd(keys=["image", "label"], spatial_size=(4, 4, 4)),
        ]
    )
    out = pre(sample)
    pred = out["image"].with_data(out["image"].numpy())
    pred.applied_ops = []
    out["pred"] = pred
    inv = P.Invertd(keys="pred", ref_key="image")(out)
    assert inv["pred"].spatial_shape == (5, 6, 7)
    np.testing.assert_array_equal(inv["pred"].numpy(), img)
