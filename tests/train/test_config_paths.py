"""Config-driven pipeline paths through train(): user preprocessing configs,
user augmentation configs (host Compose path), and fused-aug flags."""

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import train


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = tmp_path_factory.mktemp("cfg_toy")
    img_dir, lbl_dir = root / "image", root / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0))
    for i in range(4):
        lbl = np.zeros((24, 24), np.int32)
        lbl[4:12, 4:12] = 1
        lbl[14:20, 14:20] = 2
        img = (lbl == 1) * 2.0 + (lbl == 2) * -2.0 + rng.normal(0, 0.2, (24, 24))
        write_volume(img_dir / f"c{i}.nii.gz", Volume(data=img.astype(np.float32)[None], affine=aff))
        write_volume(lbl_dir / f"c{i}.nii.gz", Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()))
    return img_dir, lbl_dir


COMMON = dict(
    num_classes=3,
    spatial_dims=2,
    spatial_size=(16, 16),
    channels=(4, 8),
    strides=(2,),
    max_epochs=1,
    mixed_precision=False,
    val_roi_size=(24, 24),
)


def test_train_with_config_preprocessing(toy, tmp_path):
    img_dir, lbl_dir = toy
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "run",
        preprocessing={
            "_target_": "Compose",
            "transforms": [
                {"_target_": "LoadImaged", "keys": ["@image_key", "@label_key"]},
                {"_target_": "Orientationd", "keys": ["@image_key", "@label_key"]},
                {"_target_": "NormalizeIntensityd", "keys": "@image_key"},
                {"_target_": "EnsureTyped", "keys": ["@image_key", "@label_key"]},
            ],
        },
        **COMMON,
    )
    assert len(result.history) == 1
    assert np.isfinite(result.history[0]["train_loss"])


def test_train_with_config_augmentation_host_path(toy, tmp_path):
    img_dir, lbl_dir = toy
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "run",
        augmentation={
            "_target_": "Compose",
            "transforms": [
                {
                    "_target_": "SpatialPadd",
                    "keys": ["@image_key", "@label_key"],
                    "spatial_size": [16, 16],
                },
                {
                    "_target_": "RandCropByLabelClassesd",
                    "keys": ["@image_key", "@label_key"],
                    "label_key": "@label_key",
                    "spatial_size": [16, 16],
                    "num_classes": 3,
                    "num_samples": 2,
                },
                {
                    "_target_": "RandFlipd",
                    "keys": ["@image_key", "@label_key"],
                    "prob": 0.5,
                    "spatial_axis": 0,
                },
            ],
        },
        **COMMON,
    )
    assert len(result.history) == 1
    assert np.isfinite(result.history[0]["train_loss"])


def test_train_with_fused_device_augmentation(toy, tmp_path):
    img_dir, lbl_dir = toy
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "run",
        augment_spatial=True,
        augment_intensity=True,
        **COMMON,
    )
    assert len(result.history) == 1
    assert np.isfinite(result.history[0]["train_loss"])
