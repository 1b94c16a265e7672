"""3D end-to-end tiny-train smoke (BASELINE configs #2/#3 shape: 3D UNet,
sliding-window val, fused spatial+intensity augmentation)."""

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import train


def test_train_3d_with_augmentation(tmp_path):
    img_dir, lbl_dir = tmp_path / "image", tmp_path / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    for i in range(3):
        lbl = np.zeros((18, 18, 18), np.int32)
        lbl[4:12, 4:12, 4:12] = 1
        img = (lbl == 1) * 2.0 + rng.normal(0, 0.2, (18, 18, 18))
        write_volume(
            img_dir / f"c{i}.nii.gz",
            Volume(data=img.astype(np.float32)[None], affine=aff),
        )
        write_volume(
            lbl_dir / f"c{i}.nii.gz",
            Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()),
        )

    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "run",
        num_classes=2,
        spatial_dims=3,
        spatial_size=(8, 8, 8),
        channels=(4, 8),
        strides=(2,),
        num_samples=2,
        batch_size=2,
        max_epochs=3,
        mixed_precision=True,  # bf16 path
        augment_spatial=True,
        augment_intensity=True,
        optimizer={"optimizer": "Adam", "lr": 3e-3},
        val_roi_size=(18, 18, 18),
        seed=0,
    )
    assert result.best_checkpoint is not None
    assert np.isfinite([h["train_loss"] for h in result.history]).all()
    # tiny blob task in 3 epochs: dice should clear a low bar
    assert result.best_val_dice > 0.2, result.best_val_dice
