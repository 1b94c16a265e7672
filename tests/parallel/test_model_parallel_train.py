"""End-to-end train() with tensor parallelism (model_parallel=2).

The public ``train()`` orchestrator must run the full loop — volume cache,
patch sampler, fused augmentation, GSPMD train step, sliding-window
validation, checkpointing — with wide conv kernels sharded over the
'model' mesh axis. Runs on the conftest's 8-device virtual CPU mesh.
TPU-native extra beyond the reference's Lightning device list
(reference: src/segmantic/seg/monai_unet.py:529-538).
"""

import jax
import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import train


def _write_blob_dataset(tmp_path, n=3):
    img_dir, lbl_dir = tmp_path / "image", tmp_path / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    for i in range(n):
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
    return img_dir, lbl_dir


def test_train_model_parallel(tmp_path):
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    img_dir, lbl_dir = _write_blob_dataset(tmp_path)
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "run",
        num_classes=2,
        spatial_dims=3,
        spatial_size=(8, 8, 8),
        # 64-wide bottom stage: wide enough for shard_params to split it
        # over the 'model' axis (min_features=64)
        channels=(4, 8, 64),
        strides=(2, 2),
        num_samples=2,
        batch_size=2,
        max_epochs=2,
        mixed_precision=True,
        model_parallel=2,
        optimizer={"optimizer": "Adam", "lr": 3e-3},
        # two stride-2 stages need the window divisible by 4
        val_roi_size=(16, 16, 16),
        seed=0,
    )
    assert result.best_checkpoint is not None
    assert np.isfinite([h["train_loss"] for h in result.history]).all()


def test_train_model_parallel_must_divide(tmp_path):
    img_dir, lbl_dir = _write_blob_dataset(tmp_path, n=2)
    with pytest.raises(ValueError, match="model_parallel"):
        train(
            image_dir=img_dir,
            labels_dir=lbl_dir,
            output_dir=tmp_path / "run",
            num_classes=2,
            spatial_dims=3,
            spatial_size=(8, 8, 8),
            channels=(4, 8),
            strides=(2,),
            max_epochs=1,
            model_parallel=jax.device_count() + 1,
        )
