"""End-to-end tiny-train smoke test (the test the reference lacks —
SURVEY.md §4 'implication'): synthesize a 2D 3-tissue dataset, run train()
for a few epochs on the virtual CPU mesh, and require learning + artifacts.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import SegmentationModel, train


def synth_case(rng, shape=(32, 32)):
    """Image with 3 intensity-coded tissues + noise; label = tissue id."""
    lbl = np.zeros(shape, np.int32)
    # random rectangles of class 1 and 2
    for cls in (1, 2):
        x0, y0 = rng.integers(2, shape[0] // 2, 2)
        w, h = rng.integers(6, 12, 2)
        if cls == 2:
            x0 += shape[0] // 2 - 4
        lbl[x0 : x0 + w, y0 : y0 + h] = cls
    img = (lbl == 1) * 2.0 + (lbl == 2) * -2.0 + rng.normal(0, 0.2, shape)
    return img.astype(np.float32), lbl


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    img_dir, lbl_dir = root / "image", root / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0))
    for i in range(6):
        img, lbl = synth_case(rng)
        write_volume(img_dir / f"case{i}.nii.gz", Volume(data=img[None], affine=aff))
        write_volume(
            lbl_dir / f"case{i}.nii.gz",
            Volume(data=lbl[None].astype(np.uint8), affine=aff.copy()),
        )
    return img_dir, lbl_dir


def test_train_end_to_end(toy_dataset, tmp_path):
    img_dir, lbl_dir = toy_dataset
    out = tmp_path / "run"
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=out,
        num_classes=3,
        spatial_dims=2,
        spatial_size=(16, 16),
        channels=(4, 8, 16),
        strides=(2, 2),
        num_samples=4,
        batch_size=2,
        max_epochs=6,
        early_stop_patience=50,
        mixed_precision=False,
        optimizer={"optimizer": "Adam", "lr": 3e-3},
        val_roi_size=(32, 32),
        seed=0,
    )

    # artifacts
    assert (out / "Dataset.json").exists()
    assert (out / "history.json").exists()
    assert result.best_checkpoint is not None and result.best_checkpoint.exists()
    history = json.loads((out / "history.json").read_text())
    assert len(history) == 6

    # learning happened: loss decreased and dice is meaningful
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert result.best_val_dice > 0.35, result.best_val_dice

    # checkpoint round-trip rebuilds the model and predicts
    model = SegmentationModel.load(result.best_checkpoint)
    assert model.num_classes == 3
    import jax.numpy as jnp

    x = jnp.zeros((1, 16, 16, 1))
    y = model.apply(x)
    assert y.shape == (1, 16, 16, 3)


def test_train_resume_from_checkpoint(toy_dataset, tmp_path):
    img_dir, lbl_dir = toy_dataset
    first = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "first",
        num_classes=3,
        spatial_dims=2,
        spatial_size=(16, 16),
        channels=(4, 8),
        strides=(2,),
        max_epochs=2,
        mixed_precision=False,
        val_roi_size=(32, 32),
    )
    assert first.best_checkpoint is not None
    resumed = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "second",
        checkpoint_file=first.best_checkpoint,
        num_classes=3,
        spatial_dims=2,
        max_epochs=1,
        mixed_precision=False,
        val_roi_size=(32, 32),
    )
    assert len(resumed.history) == 1
