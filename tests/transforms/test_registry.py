import numpy as np

from segmantic_tpu.core.volume import Volume
from segmantic_tpu.transforms.base import Compose
from segmantic_tpu.transforms.registry import build_pipeline, build_transform


def test_build_compose_from_config():
    cfg = {
        "_target_": "Compose",
        "transforms": [
            {"_target_": "NormalizeIntensityd", "keys": "@image_key"},
            {"_target_": "SpatialPadd", "keys": ["@image_key"], "spatial_size": [8, 8, 8]},
        ],
    }
    pipeline = build_pipeline(cfg)
    assert isinstance(pipeline, Compose)
    assert len(pipeline.transforms) == 2
    img = Volume(data=np.random.default_rng(0).standard_normal((1, 4, 4, 4)).astype(np.float32))
    out = pipeline({"image": img})
    assert out["image"].spatial_shape == (8, 8, 8)


def test_disabled_and_empty():
    assert build_transform(None) is None
    assert build_transform({}) is None
    assert build_transform({"_target_": "NormalizeIntensityd", "keys": "image", "_disabled_": True}) is None
    cfg = {
        "_target_": "Compose",
        "transforms": [
            {"_target_": "NormalizeIntensityd", "keys": "image", "_disabled_": True},
        ],
    }
    pipeline = build_pipeline(cfg)
    assert len(pipeline.transforms) == 0


def test_at_reference_resolution():
    cfg = {"_target_": "NormalizeIntensityd", "keys": "@image_key"}
    t = build_pipeline(cfg, image_key="img").transforms[0]
    assert t.keys == ["img"]


def test_dollar_import_expression():
    cfg = {
        "_target_": "$import segmantic_tpu; segmantic_tpu.transforms.post.MapLabelsd",
        "mapping": {1: 2},
        "keys": ["label"],
    }
    t = build_transform(cfg)
    lbl = Volume(data=np.array([[[[0, 1]]]], dtype=np.int32))
    out = t({"label": lbl})
    np.testing.assert_array_equal(out["label"].numpy(), [[[[0, 2]]]])


def test_dotted_target():
    cfg = {
        "_target_": "segmantic_tpu.transforms.intensity.ScaleIntensityd",
        "keys": "image",
        "minv": 0.0,
        "maxv": 1.0,
    }
    t = build_transform(cfg)
    img = Volume(data=np.array([[[[-5.0, 5.0]]]], dtype=np.float32))
    out = t({"image": img})
    assert out["image"].numpy().min() == 0.0
    assert out["image"].numpy().max() == 1.0
