"""make_mixed_modal_dataset: pairs from two modalities merge with stem
suffixes (reference behavior: src/segmantic/image/make_mixed_modal_dataset.py)."""

from pathlib import Path

from segmantic_tpu.image.make_mixed_modal_dataset import (
    copy_image_labels,
    make_mixed_modal_dataset,
)


def _fill(d: Path, names):
    d.mkdir(parents=True)
    for n in names:
        (d / f"{n}.nii.gz").write_bytes(b"x")


def test_copy_image_labels_suffixes_stems(tmp_path):
    _fill(tmp_path / "img", ["a", "b"])
    _fill(tmp_path / "lbl", ["a", "b"])
    n = copy_image_labels(
        tmp_path / "img", tmp_path / "lbl",
        tmp_path / "out_img", tmp_path / "out_lbl", "_mdix0",
    )
    assert n == 2
    assert sorted(p.name for p in (tmp_path / "out_img").iterdir()) == [
        "a_mdix0.nii.gz", "b_mdix0.nii.gz",
    ]
    assert sorted(p.name for p in (tmp_path / "out_lbl").iterdir()) == [
        "a_mdix0.nii.gz", "b_mdix0.nii.gz",
    ]


def test_make_mixed_modal_dataset_merges_two_modalities(tmp_path):
    _fill(tmp_path / "m0_img", ["a"])
    _fill(tmp_path / "m0_lbl", ["a"])
    _fill(tmp_path / "m1_img", ["a", "c"])
    _fill(tmp_path / "m1_lbl", ["a", "c"])
    make_mixed_modal_dataset(
        tmp_path / "m0_img", tmp_path / "m0_lbl",
        tmp_path / "m1_img", tmp_path / "m1_lbl",
        tmp_path / "out_img", tmp_path / "out_lbl",
    )
    names = sorted(p.name for p in (tmp_path / "out_img").iterdir())
    assert names == ["a_mdix0.nii.gz", "a_mdix1.nii.gz", "c_mdix1.nii.gz"]
    assert names == sorted(p.name for p in (tmp_path / "out_lbl").iterdir())
