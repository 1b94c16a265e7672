from pathlib import Path

from segmantic_tpu.utils.file_iterators import (
    FileIterator,
    MatchingFileIterator,
    UniqueFileIterator,
    find_matching_files,
)


def test_file_iterator(tmp_path: Path):
    for name in ["foo.nii.gz", "bar.nii.gz", "bar.txt"]:
        (tmp_path / name).touch()

    assert len(list(FileIterator(tmp_path, glob="*"))) == 3
    nifti = list(FileIterator(tmp_path, glob="*.nii.gz"))
    assert len(nifti) == 2
    assert all(p.exists() for p in nifti)
    assert len(list(FileIterator(tmp_path, glob="*.nii.gz", skip_string="bar"))) == 1


def test_unique_file_iterator(tmp_path: Path):
    d1, d2, d3 = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    for d in (d1, d2, d3):
        d.mkdir()
    (d1 / "foo.nii.gz").touch()
    (d1 / "bar.nii.gz").touch()
    (d2 / "bar.nii.gz").touch()

    assert len(list(UniqueFileIterator(d1, d2))) == 1
    assert len(list(UniqueFileIterator(d1, d3))) == 2


def test_matching_file_iterator(tmp_path: Path):
    d1, d2 = tmp_path / "a", tmp_path / "b"
    for d in (d1, d2):
        d.mkdir()
    (d1 / "foo.nii.gz").touch()
    (d1 / "bar.nii.gz").touch()
    (d2 / "foo.nii.gz").touch()
    (d2 / "bar_seg.nii.gz").touch()

    pairs = list(MatchingFileIterator(d1, d2))
    assert len(pairs) == 2
    assert all(a.exists() and b.exists() for a, b in pairs)
    assert len(list(MatchingFileIterator(d2, d1))) == 1


def test_find_matching_files(tmp_path: Path):
    img, lbl = tmp_path / "img", tmp_path / "lbl"
    img.mkdir()
    lbl.mkdir()
    for stem in ["s1", "s2", "s3"]:
        (img / f"{stem}.nii.gz").touch()
    for stem in ["s1", "s3"]:
        (lbl / f"{stem}.nii.gz").touch()

    pairs = find_matching_files(
        [img / "*.nii.gz", lbl / "*.nii.gz"], verbose=False
    )
    assert len(pairs) == 2
    assert all(len(pair) == 2 for pair in pairs)
