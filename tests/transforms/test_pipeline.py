import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.transforms.base import Compose
from segmantic_tpu.transforms import spatial as S
from segmantic_tpu.transforms import intensity as I
from segmantic_tpu.transforms import post as P


def make_sample(shape=(12, 13, 14), num_classes=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((1,) + shape).astype(np.float32) + 10
    lbl = np.zeros((1,) + shape, dtype=np.int32)
    lbl[0, 3:9, 4:10, 5:11] = 1
    lbl[0, 5:7, 6:8, 7:9] = 2
    aff = affine_from_spacing_origin((1.0, 1.2, 0.8), (3, -2, 1))
    return {
        "image": Volume(data=img, affine=aff),
        "label": Volume(data=lbl, affine=aff.copy()),
    }


def test_normalize_intensity():
    s = make_sample()
    out = S.NormalizeIntensityd(keys="image")(s)
    data = out["image"].numpy()
    assert abs(data.mean()) < 1e-5
    assert abs(data.std() - 1.0) < 1e-4


def test_crop_foreground():
    s = make_sample()
    out = S.CropForegroundd(keys=["image", "label"], source_key="label")(s)
    assert out["label"].spatial_shape == (6, 6, 6)
    assert out["image"].spatial_shape == (6, 6, 6)
    assert np.all(out["label"].numpy()[0] >= 0)
    # origin shifted by crop start
    np.testing.assert_allclose(
        out["image"].origin, [3 + 3 * 1.0, -2 + 4 * 1.2, 1 + 5 * 0.8]
    )
    assert out["image"].applied_ops[-1]["op"] == "crop"


def test_rand_crop_by_label_classes():
    s = make_sample()
    rng = np.random.default_rng(0)
    t = S.RandCropByLabelClassesd(
        keys=["image", "label"],
        label_key="label",
        spatial_size=(4, 4, 4),
        num_classes=3,
        num_samples=5,
        ratios=[0, 1, 1],
    )
    patches = t(s, rng)
    assert len(patches) == 5
    for p in patches:
        assert p["image"].spatial_shape == (4, 4, 4)
        assert p["label"].spatial_shape == (4, 4, 4)
        # center voxel must be foreground (ratios exclude background)
        assert p["label"].numpy()[0, 2, 2, 2] > 0


def test_compose_split_and_fanout():
    t = Compose(
        [
            S.NormalizeIntensityd(keys="image"),
            S.SpatialPadd(keys=["image", "label"], spatial_size=(16, 16, 16)),
            S.RandCropByLabelClassesd(
                keys=["image", "label"],
                label_key="label",
                spatial_size=(4, 4, 4),
                num_classes=3,
                num_samples=2,
            ),
            S.RandFlipd(keys=["image", "label"], prob=1.0, spatial_axis=0),
        ],
        rng=np.random.default_rng(1),
    )
    det, rand = t.split_deterministic()
    assert len(det.transforms) == 2
    assert len(rand.transforms) == 2
    out = t(make_sample())
    assert isinstance(out, list) and len(out) == 2


def test_pipeline_deterministic_given_seed():
    t = S.RandRotated(keys=["image"], prob=1.0, range_z=0.4)
    s = make_sample()
    out1 = t(s, np.random.default_rng(42))["image"].numpy()
    out2 = t(s, np.random.default_rng(42))["image"].numpy()
    np.testing.assert_array_equal(out1, out2)
    out3 = t(s, np.random.default_rng(43))["image"].numpy()
    assert not np.array_equal(out1, out3)


def test_rotate_zoom_label_preserves_integers():
    s = make_sample()
    rot = S.RandRotated(keys=["image", "label"], prob=1.0, range_z=0.4)(
        s, np.random.default_rng(0)
    )
    assert rot["label"].numpy().dtype == np.int32
    assert set(np.unique(rot["label"].numpy())) <= {0, 1, 2}
    zoom = S.RandZoomd(keys=["image", "label"], prob=1.0)(
        s, np.random.default_rng(0)
    )
    assert set(np.unique(zoom["label"].numpy())) <= {0, 1, 2}


def test_intensity_transforms_change_image_not_label():
    s = make_sample()
    rng = np.random.default_rng(0)
    for t in [
        I.RandAdjustContrastd(keys="image", prob=1.0),
        I.RandHistogramShiftd(keys="image", prob=1.0),
        I.RandBiasFieldd(keys="image", prob=1.0),
        I.RandGibbsNoised(keys="image", prob=1.0, alpha=(0.3, 0.6)),
        I.RandKSpaceSpikeNoised(keys="image", prob=1.0),
    ]:
        out = t(s, rng)
        assert out["image"].numpy().shape == s["image"].numpy().shape
        assert not np.array_equal(out["image"].numpy(), s["image"].numpy()), type(t)
        assert out["label"] is s["label"]
        assert np.isfinite(out["image"].numpy()).all(), type(t)


def test_gibbs_alpha_zero_identity():
    s = make_sample()
    out = I.RandGibbsNoised(keys="image", prob=1.0, alpha=(0.0, 0.0))(
        s, np.random.default_rng(0)
    )
    np.testing.assert_allclose(
        out["image"].numpy(), s["image"].numpy(), atol=1e-3
    )


def test_map_labels():
    arr = np.array([[0, 1, 2], [2, 1, 0]])
    out = P.MapLabels({0: 0, 1: 5, 2: 1})(arr)
    np.testing.assert_array_equal(out, [[0, 5, 1], [1, 5, 0]])


def test_as_discrete_and_onehot():
    probs = np.zeros((3, 2, 2, 2), dtype=np.float32)
    probs[1] = 0.9
    vol = Volume(data=probs)
    out = P.AsDiscreted(keys="pred")({"pred": vol})
    assert out["pred"].numpy().shape == (1, 2, 2, 2)
    assert np.all(out["pred"].numpy() == 1)
    oh = P.AsDiscreted(keys="pred", argmax=False, to_onehot=3)({"pred": out["pred"]})
    assert oh["pred"].numpy().shape == (3, 2, 2, 2)
    assert np.all(oh["pred"].numpy()[1] == 1)
