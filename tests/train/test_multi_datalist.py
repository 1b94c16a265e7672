"""Multi-dataset training: 'datalist' as a LIST of datalist jsons
(BASELINE config #4; reference train-config docstring 'multiple datasets')."""

import json

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import train
from segmantic_tpu.utils.schema import validate_against_signature


def _make_site(root, name, n, seed):
    site = root / name
    (site / "image").mkdir(parents=True)
    (site / "label").mkdir(parents=True)
    rng = np.random.default_rng(seed)
    aff = affine_from_spacing_origin((1.0, 1.0))
    for i in range(n):
        lbl = np.zeros((20, 20), np.int32)
        lbl[4:12, 4:12] = 1
        img = (lbl == 1) * 2.0 + rng.normal(0, 0.2, (20, 20))
        write_volume(site / f"image/c{i}.nii.gz", Volume(data=img.astype(np.float32)[None], affine=aff))
        write_volume(site / f"label/c{i}.nii.gz", Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()))
    datalist = {
        "labels": {"1": "FG"},
        "training": [
            {"image": f"image/c{i}.nii.gz", "label": f"label/c{i}.nii.gz"}
            for i in range(n - 1)
        ],
        "validation": [
            {"image": f"image/c{n-1}.nii.gz", "label": f"label/c{n-1}.nii.gz"}
        ],
    }
    path = site / "dataset.json"
    path.write_text(json.dumps(datalist))
    return path


def test_schema_casts_datalist_list():
    def fn(*, datalist=None):
        from pathlib import Path  # noqa

    from pathlib import Path
    from typing import Optional, Union

    def train_like(*, datalist: Path = None):
        pass

    out = validate_against_signature(
        {"datalist": ["a.json", "b.json"]}, train_like
    )
    assert out["datalist"] == [Path("a.json"), Path("b.json")]


def test_train_on_two_datalists(tmp_path):
    dl_a = _make_site(tmp_path, "siteA", 3, seed=0)
    dl_b = _make_site(tmp_path, "siteB", 3, seed=1)
    result = train(
        datalist=[dl_a, dl_b],
        output_dir=tmp_path / "run",
        num_classes=2,
        spatial_dims=2,
        spatial_size=(16, 16),
        channels=(4, 8),
        strides=(2,),
        max_epochs=1,
        mixed_precision=False,
        val_roi_size=(20, 20),
    )
    assert len(result.history) == 1
    assert np.isfinite(result.history[0]["train_loss"])
    # dataset dump combined both sites: 4 train + 2 val pairs
    data = json.loads((tmp_path / "run" / "Dataset.json").read_text())
    assert len(data["training"]) == 4
    assert len(data["validation"]) == 2
