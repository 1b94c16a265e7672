"""Determinism: identical seeds → identical training trajectories and
bit-identical deterministic preprocessing (SURVEY.md §5.2 — the reference
relies on MONAI set_determinism; here randomness is explicitly keyed)."""

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import default_preprocessing, train


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = tmp_path_factory.mktemp("det_toy")
    img_dir, lbl_dir = root / "image", root / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(3)
    aff = affine_from_spacing_origin((1.0, 1.0))
    for i in range(4):
        lbl = np.zeros((24, 24), np.int32)
        lbl[4:12, 4:12] = 1
        img = (lbl == 1) * 2.0 + rng.normal(0, 0.2, (24, 24))
        write_volume(img_dir / f"c{i}.nii.gz", Volume(data=img.astype(np.float32)[None], affine=aff))
        write_volume(lbl_dir / f"c{i}.nii.gz", Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()))
    return img_dir, lbl_dir


def test_preprocessing_bit_identical(toy):
    img_dir, lbl_dir = toy
    pre = default_preprocessing(["image", "label"])
    files = {"image": img_dir / "c0.nii.gz", "label": lbl_dir / "c0.nii.gz"}
    a = pre(dict(files))
    b = pre(dict(files))
    np.testing.assert_array_equal(a["image"].numpy(), b["image"].numpy())
    np.testing.assert_array_equal(a["label"].numpy(), b["label"].numpy())
    assert a["image"].numpy().tobytes() == b["image"].numpy().tobytes()


def test_training_trajectory_deterministic(toy, tmp_path):
    img_dir, lbl_dir = toy
    kwargs = dict(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        num_classes=2,
        spatial_dims=2,
        spatial_size=(16, 16),
        channels=(4, 8),
        strides=(2,),
        max_epochs=2,
        mixed_precision=False,
        augment_spatial=True,
        augment_intensity=True,
        val_roi_size=(24, 24),
        seed=123,
    )
    r1 = train(output_dir=tmp_path / "a", **kwargs)
    r2 = train(output_dir=tmp_path / "b", **kwargs)
    for h1, h2 in zip(r1.history, r2.history):
        assert h1["train_loss"] == h2["train_loss"]
        assert h1["val_dice"] == h2["val_dice"]
