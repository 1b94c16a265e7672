"""Image/label pair datasets: glob pairing, MSD/nnUNet datalists, k-fold.

Pure path/json logic — behavioral parity with the reference's data layer
(reference: src/segmantic/seg/dataset.py:14-222): directory-glob stem
pairing, shuffled train/val split, MSD-style multi-file datalist json with
glob support, k-fold materialization. The k-fold split reproduces sklearn
``KFold`` fold sizing (first ``n % k`` folds get one extra sample) without
the sklearn dependency.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

from ..utils.file_iterators import find_matching_files
from ..utils.json import PathEncoder

DataDict = Dict[str, Path]


def create_data_dict(
    list_to_convert: List[Dict[str, str]],
    data_dir: Path,
    data_dicts: List[DataDict],
) -> List[DataDict]:
    """Expand glob expressions in a datalist section into concrete pairs.

    Absolute paths are taken verbatim; relative entries are globbed against
    ``data_dir`` and paired in sorted order.
    """
    for element in list_to_convert:
        if Path(element["image"]).is_absolute():
            image_files = [Path(element["image"])]
            label_files = [Path(element["label"])]
        else:
            image_files = sorted(data_dir.glob(element["image"]))
            label_files = sorted(data_dir.glob(element["label"]))
        if len(image_files) != len(label_files):
            raise ValueError(
                f"image/label glob count mismatch for {element}: "
                f"{len(image_files)} vs {len(label_files)}"
            )
        for img, lbl in zip(image_files, label_files):
            data_dicts.append({"image": img, "label": lbl})
    return data_dicts


def kfold_split(n: int, num_splits: int) -> List[tuple]:
    """(train_idx, val_idx) pairs; sklearn KFold fold sizing, no shuffle."""
    sizes = [n // num_splits + (1 if i < n % num_splits else 0) for i in range(num_splits)]
    folds, start = [], 0
    for s in sizes:
        folds.append(list(range(start, start + s)))
        start += s
    out = []
    for i, val in enumerate(folds):
        train = [j for f in folds[:i] + folds[i + 1 :] for j in f]
        out.append((train, val))
    return out


class PairedDataSet:
    """Paired image/label dataset with train/val/test splits."""

    def __init__(
        self,
        image_dir: Optional[Path] = None,
        image_glob: str = "*.nii.gz",
        labels_dir: Optional[Path] = None,
        labels_glob: str = "*.nii.gz",
        *,
        valid_split: float = 0.2,
        shuffle: bool = True,
        random_seed: Optional[int] = None,
        max_files: int = 0,
    ):
        data_dicts = self.create_data_dict(image_dir, image_glob, labels_dir, labels_glob)
        self._split(data_dicts, valid_split, shuffle, random_seed, max_files)

    # -- accessors ----------------------------------------------------------
    def training_files(self) -> Sequence[DataDict]:
        return self._train_files

    def validation_files(self) -> Sequence[DataDict]:
        return self._val_files

    def test_files(self) -> Sequence[DataDict]:
        return self._test_files

    # -- construction -------------------------------------------------------
    def _split(
        self,
        data_dicts: List[DataDict],
        valid_split: float,
        shuffle: bool,
        random_seed: Optional[int] = None,
        max_files: int = 0,
        test_data_dicts: Optional[List[DataDict]] = None,
    ) -> None:
        self._test_files: List[DataDict] = list(test_data_dicts or [])
        if shuffle:
            random.Random(random_seed).shuffle(data_dicts)
        num_total = len(data_dicts)
        if max_files > 0:
            num_total = min(num_total, max_files)
        num_valid = int(valid_split * num_total)
        if num_total > 1 and valid_split > 0:
            num_valid = max(num_valid, 1)
        self._val_files = data_dicts[:num_valid]
        self._train_files = data_dicts[num_valid:num_total]

    def check_matching_filenames(self) -> None:
        """Require image/label stems to contain one another (pairing sanity)."""
        for d in list(self._train_files) + list(self._val_files):
            image_stem = d["image"].stem.replace(".nii", "").lower()
            label_stem = d["label"].stem.replace(".nii", "").lower()
            if image_stem not in label_stem and label_stem not in image_stem:
                raise RuntimeError(
                    f"The pair image/label pair {d['image']} : {d['label']} "
                    "doesn't correspond."
                )

    def dump_dataset(self) -> str:
        """Serialize splits as an MSD-style datalist json string."""
        return json.dumps(
            {
                "training": self._train_files,
                "validation": self._val_files,
                "test": [t["image"] for t in self._test_files],
            },
            cls=PathEncoder,
        )

    @staticmethod
    def create_data_dict(
        image_dir: Optional[Path] = None,
        image_glob: str = "*.nii.gz",
        labels_dir: Optional[Path] = None,
        labels_glob: str = "*.nii.gz",
    ) -> List[DataDict]:
        """Pair files from two directories by shared stem."""
        if image_dir is None or labels_dir is None:
            return []
        image_dir, labels_dir = Path(image_dir), Path(labels_dir)
        if not (image_dir.is_dir() and labels_dir.is_dir()):
            raise NotADirectoryError(f"{image_dir} or {labels_dir} is not a directory")
        if Path(image_glob).is_absolute():
            image_glob = str(Path(image_glob).relative_to(image_dir))
        if Path(labels_glob).is_absolute():
            labels_glob = str(Path(labels_glob).relative_to(labels_dir))
        matches = find_matching_files(
            [image_dir / image_glob, labels_dir / labels_glob], verbose=False
        )
        return [{"image": pair[0], "label": pair[1]} for pair in matches]

    @staticmethod
    def kfold_crossval(
        num_splits: int,
        data_dicts: List[DataDict],
        output_dir: Path,
        test_data_dicts: Optional[List[DataDict]] = None,
        shuffle: bool = True,
        random_seed: Optional[int] = None,
    ) -> List[Path]:
        """Materialize k folds as ``fold_<k>.json`` datalists in output_dir."""
        if shuffle:
            random.Random(random_seed).shuffle(data_dicts)
        output_dir = Path(output_dir)
        output_dir.mkdir(exist_ok=True, parents=True)

        paths: List[Path] = []
        for count, (train_idx, val_idx) in enumerate(
            kfold_split(len(data_dicts), num_splits)
        ):
            ds = PairedDataSet()
            ds._train_files = [data_dicts[i] for i in train_idx]
            ds._val_files = [data_dicts[i] for i in val_idx]
            ds._test_files = list(test_data_dicts or [])
            path = output_dir / f"fold_{count}.json"
            path.write_text(ds.dump_dataset())
            paths.append(path)
        return paths

    @staticmethod
    def load_from_json(
        datalist_paths: Union[Path, str, List[Path]],
    ) -> "PairedDataSet":
        """Load (and combine) MSD/nnUNet-style datalist json files.

        'training'/'validation' entries may be concrete paths or glob
        expressions relative to the json's directory; 'test' is a plain list
        of image paths.
        """
        if isinstance(datalist_paths, (Path, str)):
            datalist_paths = [datalist_paths]

        train: List[DataDict] = []
        val: List[DataDict] = []
        test: List[DataDict] = []

        for json_path in (Path(p) for p in datalist_paths):
            ds = json.loads(json_path.read_text())
            train = create_data_dict(ds["training"], json_path.parent, train)
            val = create_data_dict(ds["validation"], json_path.parent, val)
            for f in ds.get("test", []):
                # entries may be plain image paths or {"image": ..., "label": ...}
                entry = {"image": f} if isinstance(f, (str, Path)) else dict(f)
                resolved: DataDict = {}
                for k, v in entry.items():
                    p = Path(v)
                    if not p.is_absolute():
                        p = json_path.parent / p
                    resolved[k] = p
                test.append(resolved)

        combined = PairedDataSet()
        combined._train_files = train
        combined._val_files = val
        combined._test_files = test
        return combined
