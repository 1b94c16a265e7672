import json
from pathlib import Path

import pytest

from segmantic_tpu.data.dataset import PairedDataSet, kfold_split


@pytest.fixture
def dataset_mockup(tmp_path: Path):
    image_dir = tmp_path / "image"
    labels_dir = tmp_path / "label"
    image_dir.mkdir()
    labels_dir.mkdir()
    for i in range(10):
        (image_dir / f"case{i:02d}.nii.gz").touch()
        (labels_dir / f"case{i:02d}.nii.gz").touch()
    return image_dir, labels_dir


def test_split_arithmetic(dataset_mockup):
    image_dir, labels_dir = dataset_mockup
    ds = PairedDataSet(image_dir, "*.nii.gz", labels_dir, "*.nii.gz", valid_split=0.2)
    assert len(ds.training_files()) == 8
    assert len(ds.validation_files()) == 2
    ds.check_matching_filenames()

    ds = PairedDataSet(image_dir, "*.nii.gz", labels_dir, "*.nii.gz", valid_split=0.0)
    assert len(ds.training_files()) == 10
    assert len(ds.validation_files()) == 0

    # tiny-split floor: >1 file and valid_split>0 -> at least one val case
    ds = PairedDataSet(image_dir, "*.nii.gz", labels_dir, "*.nii.gz", valid_split=0.01)
    assert len(ds.validation_files()) == 1

    ds = PairedDataSet(
        image_dir, "*.nii.gz", labels_dir, "*.nii.gz", valid_split=0.2, max_files=5
    )
    assert len(ds.training_files()) + len(ds.validation_files()) == 5


def test_split_deterministic_with_seed(dataset_mockup):
    image_dir, labels_dir = dataset_mockup
    a = PairedDataSet(image_dir, "*.nii.gz", labels_dir, "*.nii.gz", random_seed=7)
    b = PairedDataSet(image_dir, "*.nii.gz", labels_dir, "*.nii.gz", random_seed=7)
    assert a.training_files() == b.training_files()
    assert a.validation_files() == b.validation_files()


def test_datalist_json_roundtrip(dataset_mockup, tmp_path):
    image_dir, labels_dir = dataset_mockup
    ds = PairedDataSet(image_dir, "*.nii.gz", labels_dir, "*.nii.gz")
    datalist = tmp_path / "datalist.json"
    datalist.write_text(ds.dump_dataset())
    loaded = PairedDataSet.load_from_json(datalist)
    assert len(loaded.training_files()) == len(ds.training_files())
    assert len(loaded.validation_files()) == len(ds.validation_files())


def test_datalist_with_globs(dataset_mockup, tmp_path):
    image_dir, labels_dir = dataset_mockup
    datalist = tmp_path / "datalist.json"
    datalist.write_text(
        json.dumps(
            {
                "training": [
                    {"image": "image/case0*.nii.gz", "label": "label/case0*.nii.gz"}
                ],
                "validation": [],
                "test": ["image/case00.nii.gz"],
            }
        )
    )
    ds = PairedDataSet.load_from_json(datalist)
    assert len(ds.training_files()) == 10
    assert all(
        d["image"].name == d["label"].name for d in ds.training_files()
    )
    assert len(ds.test_files()) == 1
    assert ds.test_files()[0]["image"].exists()


def test_kfold_split_matches_sklearn_sizing():
    folds = kfold_split(10, 7)
    assert len(folds) == 7
    val_sizes = [len(v) for _, v in folds]
    assert val_sizes == [2, 2, 2, 1, 1, 1, 1]
    # all indices covered exactly once across val sets
    covered = sorted(i for _, v in folds for i in v)
    assert covered == list(range(10))
    for train, val in folds:
        assert sorted(train + val) == list(range(10))


def test_kfold_materialization(dataset_mockup, tmp_path):
    image_dir, labels_dir = dataset_mockup
    dicts = PairedDataSet.create_data_dict(image_dir, "*.nii.gz", labels_dir, "*.nii.gz")
    out = tmp_path / "folds"
    paths = PairedDataSet.kfold_crossval(7, dicts, out, random_seed=0)
    assert len(paths) == 7
    for p in paths:
        assert p.exists()
        ds = PairedDataSet.load_from_json(p)
        assert len(ds.training_files()) + len(ds.validation_files()) == 10


def test_mismatched_suffix_not_paired(tmp_path):
    image_dir = tmp_path / "image"
    labels_dir = tmp_path / "label"
    image_dir.mkdir()
    labels_dir.mkdir()
    (image_dir / "a.nii.gz").touch()
    (labels_dir / "b.nii.gz").touch()
    dicts = PairedDataSet.create_data_dict(
        image_dir, "*.nii.gz", labels_dir, "*.nii.gz"
    )
    assert dicts == []


def test_check_matching_filenames_negative(tmp_path):
    ds = PairedDataSet.from_files(
        training=[{"image": Path("img/a.nii.gz"), "label": Path("lbl/b.nii.gz")}]
    )
    with pytest.raises(RuntimeError):
        ds.check_matching_filenames()
