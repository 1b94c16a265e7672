"""predict() end-to-end: spacing resample + inversion back to the original
grid, metric artifacts, ensemble modes."""

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import read_volume, write_volume
from segmantic_tpu.train.trainer import train


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("predict_toy")
    img_dir, lbl_dir = root / "image", root / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    # anisotropic spacing to exercise resample+invert
    aff = affine_from_spacing_origin((1.0, 1.5), (3.0, -2.0))
    for i in range(4):
        lbl = np.zeros((24, 20), np.int32)
        lbl[4:12, 4:12] = 1
        lbl[14:20, 12:18] = 2
        img = (lbl == 1) * 2.0 + (lbl == 2) * -2.0 + rng.normal(0, 0.2, (24, 20))
        write_volume(img_dir / f"c{i}.nii.gz", Volume(data=img.astype(np.float32)[None], affine=aff))
        write_volume(lbl_dir / f"c{i}.nii.gz", Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()))
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=root / "run",
        num_classes=3,
        spatial_dims=2,
        spatial_size=(16, 16),
        channels=(8, 16),
        strides=(2,),
        max_epochs=8,
        mixed_precision=False,
        optimizer={"optimizer": "Adam", "lr": 3e-3},
        val_roi_size=(24, 24),
        seed=0,
    )
    return root, img_dir, lbl_dir, result


def test_predict_with_spacing_and_metrics(trained, tmp_path):
    root, img_dir, lbl_dir, result = trained
    from segmantic_tpu.infer.predict import predict

    out_dir = tmp_path / "pred"
    results = predict(
        model_file=result.best_checkpoint,
        test_images=[img_dir / "c0.nii.gz"],
        test_labels=[lbl_dir / "c0.nii.gz"],
        tissue_dict={"A": 1, "B": 2},
        output_dir=out_dir,
        spacing=[1.2, 1.2],  # resample at preprocess, invert at post
    )
    assert len(results) == 1
    saved = results[0].saved_to
    assert saved is not None and saved.exists()
    pred = read_volume(saved)
    orig = read_volume(img_dir / "c0.nii.gz")
    # inverted prediction lands back on the ORIGINAL grid
    assert pred.spatial_shape == orig.spatial_shape
    np.testing.assert_allclose(pred.affine, orig.affine, atol=1e-4)
    assert results[0].dice is not None and results[0].dice > 0.5
    assert (out_dir / "mean_dice.txt").exists()
    assert list(out_dir.glob("*_confusion.png"))


def test_ensemble_modes(trained, tmp_path):
    root, img_dir, lbl_dir, result = trained
    from segmantic_tpu.infer.ensemble import ensemble_creator
    from segmantic_tpu.utils import config as cfg

    ckpts = sorted((root / "run").glob("*.ckpt"))
    assert len(ckpts) >= 2

    for mode, extra in [
        ("mean", {}),
        ("vote", {}),
        (
            "select_best",
            {"candidate_yaml": {"A": 0, "B": min(1, len(ckpts) - 1)}},
        ),
    ]:
        out_dir = tmp_path / f"ens_{mode}"
        kwargs = dict(
            model_files=ckpts[:2],
            test_images=[img_dir / "c1.nii.gz"],
            output_dir=out_dir,
            tissue_dict={"A": 1, "B": 2},
            combination_mode=mode,
            roi_size=(16, 16),
        )
        if extra:
            yml = tmp_path / f"{mode}.yml"
            cfg.dump(extra["candidate_yaml"], yml)
            kwargs["candidate_per_tissue_path"] = yml
        saved = ensemble_creator(**kwargs)
        assert len(saved) == 1 and saved[0].exists()
        pred = read_volume(saved[0])
        assert set(np.unique(pred.numpy())) <= {0, 1, 2}


def test_predict_flipped_2d_affine_matches_physical(trained, tmp_path):
    """A 2D image stored with a flipped (negative-determinant) affine must
    predict the same physical segmentation as its unflipped twin, and the
    saved output must land back on the flipped grid/affine exactly."""
    from segmantic_tpu.infer.predict import predict

    root, img_dir, lbl_dir, result = trained
    orig = read_volume(img_dir / "c0.nii.gz")
    data = orig.numpy()

    # same physical content, voxel axis 0 reversed and affine flipped to match
    flipped = data[:, ::-1, :].copy()
    aff = orig.affine.copy()
    aff[:3, 3] = aff[:3, 3] + aff[:3, 0] * (data.shape[1] - 1)
    aff[:3, 0] = -aff[:3, 0]
    flip_dir = tmp_path / "flip"
    flip_dir.mkdir()
    write_volume(flip_dir / "c0f.nii.gz", Volume(data=flipped, affine=aff))

    out_a = tmp_path / "pred_a"
    out_b = tmp_path / "pred_b"
    predict(result.best_checkpoint, [img_dir / "c0.nii.gz"], output_dir=out_a,
            save_confusion_plots=False)
    predict(result.best_checkpoint, [flip_dir / "c0f.nii.gz"], output_dir=out_b,
            save_confusion_plots=False)

    pred_a = read_volume(next(out_a.rglob("*.nii.gz")))
    pred_b = read_volume(next(out_b.rglob("*.nii.gz")))

    # output B sits on the flipped input grid ...
    assert pred_b.spatial_shape == orig.spatial_shape
    np.testing.assert_allclose(pred_b.affine, aff, atol=1e-4)
    # ... and equals output A once unflipped (identical physical prediction)
    np.testing.assert_array_equal(pred_b.numpy()[:, ::-1, :], pred_a.numpy())
