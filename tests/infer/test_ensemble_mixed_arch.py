"""Ensembles across ARCHITECTURES: checkpoints record arch + arch_params,
so a UNet and a SegResNet reload and combine through the same ensemble
path (reference analog combines same-arch fold models only:
src/segmantic/seg/monai_unet.py:834-1004)."""

import numpy as np

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.infer.ensemble import ensemble_creator
from segmantic_tpu.io.nifti import read_volume, write_volume
from segmantic_tpu.train.checkpoint import save_checkpoint
from segmantic_tpu.train.trainer import SegmentationModel


def _save(model, path):
    save_checkpoint(path, model.variables, hparams=model.hparams,
                    metrics={"val_dice": 0.5})
    return path


def test_mixed_arch_mean_ensemble(tmp_path):
    unet = SegmentationModel.create(
        num_classes=3, spatial_dims=3, spatial_size=[16, 16, 16],
        channels=(4, 8), strides=(2,), num_res_units=1,
    )
    segresnet = SegmentationModel.create(
        num_classes=3, spatial_dims=3, spatial_size=[16, 16, 16],
        arch="segresnet",
        arch_params={"init_filters": 4, "blocks_down": (1, 1),
                     "blocks_up": (1,)},
    )
    ckpts = [
        _save(unet, tmp_path / "unet.ckpt"),
        _save(segresnet, tmp_path / "segresnet.ckpt"),
    ]

    rng = np.random.default_rng(0)
    img = rng.standard_normal((20, 18, 16)).astype(np.float32)
    img_path = tmp_path / "case.nii.gz"
    write_volume(img_path, Volume(
        data=img[None], affine=affine_from_spacing_origin((1.0, 1.0, 1.0))))

    saved = ensemble_creator(
        model_files=ckpts,
        test_images=[img_path],
        output_dir=tmp_path / "out",
        combination_mode="mean",
        roi_size=(16, 16, 16),
    )
    assert len(saved) == 1 and saved[0].exists()
    pred = read_volume(saved[0])
    assert pred.spatial_shape == (20, 18, 16)
    assert set(np.unique(pred.numpy())) <= {0, 1, 2}
