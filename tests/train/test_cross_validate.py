"""cross_validate() end-to-end: fold materialization + subprocess training
per scenario/fold + checkpoint evaluation on a test set (the reference runs
each fold in a fresh interpreter too; reference:
src/segmantic/seg/monai_unet.py:795-806)."""

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.image.labels import save_tissue_list
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.cross_validate import cross_validate
from segmantic_tpu.utils import config


@pytest.mark.slow
def test_cross_validate_end_to_end(tmp_path):
    img_dir, lbl_dir = tmp_path / "image", tmp_path / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0))
    for i in range(4):
        lbl = np.zeros((16, 16), np.int32)
        lbl[4:12, 4:12] = 1
        img = (lbl == 1) * 2.0 + rng.normal(0, 0.2, (16, 16))
        write_volume(img_dir / f"c{i}.nii.gz", Volume(data=img.astype(np.float32)[None], affine=aff))
        write_volume(lbl_dir / f"c{i}.nii.gz", Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()))

    tissues = tmp_path / "tissues.txt"
    save_tissue_list({"FG": 1}, tissues)

    cfg_dir = tmp_path / "config_files"
    cfg_dir.mkdir()
    config.dump(
        {
            "num_classes": 2,
            "spatial_dims": 2,
            "spatial_size": [8, 8],
            "channels": [4, 8],
            "strides": [2],
            "max_epochs": 1,
            "mixed_precision": False,
            "val_roi_size": [16, 16],
        },
        cfg_dir / "tiny.yml",
    )

    out = tmp_path / "cv_out"
    cross_validate(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        tissue_list=tissues,
        output_dir=out,
        config_files_dir=cfg_dir,
        num_splits=2,
        # both folds in flight at once (the bounded subprocess pool)
        max_parallel=2,
    )

    folds = sorted((out / "datafolds").glob("fold_*.json"))
    assert len(folds) == 2
    for fold in range(2):
        fold_out = out / "tiny" / str(fold)
        assert (fold_out / "config.yml").exists()
        assert list(fold_out.glob("*.ckpt")), f"no checkpoint for fold {fold}"
        assert (fold_out / "history.json").exists()
