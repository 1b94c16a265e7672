"""End-to-end train -> predict on REALISTIC geometry (r2 VERDICT #8):
anisotropic spacing and a rotated, negative-determinant direction matrix
flow through cache -> augment -> sliding-window val -> Invertd -> saved
NIfTI round-trip.

The reference pipeline handles this via MONAI Orientationd/Spacingd at
load and Invertd at save (reference: src/segmantic/seg/monai_unet.py:
151-176, 595-625); here the same flow must reproduce the ORIGINAL grid
(shape + affine) in the saved prediction and segment the blob on it.
"""

from __future__ import annotations

import math

import numpy as np

from segmantic_tpu.core.volume import Volume
from segmantic_tpu.io.nifti import read_volume, write_volume
from segmantic_tpu.train.trainer import train


def _affine():
    """Rotated (25 deg about z), anisotropic, NEGATIVE-determinant affine."""
    c, s = math.cos(math.radians(25.0)), math.sin(math.radians(25.0))
    direction = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, -1.0]])
    spacing = np.array([0.9, 1.2, 1.6])
    aff = np.eye(4)
    aff[:3, :3] = direction * spacing[None, :]
    aff[:3, 3] = [10.0, -5.0, 7.0]
    assert np.linalg.det(aff[:3, :3]) < 0
    return aff


def _make_case(rng, shape=(20, 18, 16)):
    ii, jj, kk = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    cx = np.array(shape) / 2.0 + rng.uniform(-2, 2, 3)
    r = ((ii - cx[0]) / 5.0) ** 2 + ((jj - cx[1]) / 4.5) ** 2 + (
        (kk - cx[2]) / 4.0
    ) ** 2
    lbl = (r < 1.0).astype(np.uint8)
    img = lbl * 2.0 + rng.normal(0, 0.2, shape)
    return img.astype(np.float32), lbl


def test_train_predict_round_trip_rotated_anisotropic(tmp_path):
    rng = np.random.default_rng(0)
    img_dir, lbl_dir = tmp_path / "image", tmp_path / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    aff = _affine()
    for i in range(3):
        img, lbl = _make_case(rng)
        write_volume(img_dir / f"c{i}.nii.gz", Volume(data=img[None], affine=aff.copy()))
        write_volume(lbl_dir / f"c{i}.nii.gz", Volume(data=lbl[None], affine=aff.copy()))

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
        mixed_precision=True,
        augment_spatial=True,
        augment_intensity=True,
        optimizer={"optimizer": "Adam", "lr": 3e-3},
        spacing=(1.0, 1.0, 1.0),  # anisotropic -> isotropic resample
        val_roi_size=(16, 16, 16),  # forces a multi-window sliding val
        seed=0,
    )
    assert result.best_checkpoint is not None
    assert result.best_val_dice > 0.2, result.best_val_dice

    from segmantic_tpu.infer.predict import predict

    out_dir = tmp_path / "pred"
    cases = predict(
        model_file=result.best_checkpoint,
        test_images=[img_dir / "c0.nii.gz"],
        test_labels=[lbl_dir / "c0.nii.gz"],
        output_dir=out_dir,
        spacing=(1.0, 1.0, 1.0),
        sw_batch_size=2,
        overlap=0.25,
        save_confusion_plots=False,
    )
    assert len(cases) == 1

    # the saved prediction must live on the ORIGINAL grid: same shape and
    # the same rotated negative-determinant affine (Invertd round trip)
    pred_files = sorted(out_dir.glob("*.nii.gz"))
    assert pred_files, list(out_dir.iterdir())
    pred = read_volume(pred_files[0])
    src = read_volume(img_dir / "c0.nii.gz")
    assert pred.data.shape[1:] == src.data.shape[1:]
    np.testing.assert_allclose(pred.affine, src.affine, atol=1e-4)

    # and segment the blob on that grid (easy task; bar is deliberately low
    # but nonzero so a geometry bug that misplaces the blob fails)
    truth = read_volume(lbl_dir / "c0.nii.gz").data[0] > 0
    got = pred.data[0] > 0
    inter = float(np.sum(truth & got))
    dice = 2 * inter / max(float(truth.sum() + got.sum()), 1.0)
    assert dice > 0.5, dice
