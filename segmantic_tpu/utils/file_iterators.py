"""File discovery and stem-matching helpers.

Behavioral parity with the reference's file plumbing
(reference: src/segmantic/utils/file_iterators.py:9-119), reimplemented as
simple generator-backed iterables: multi-glob stem pairing
(:func:`find_matching_files`) plus three small directory iterators used by
the ops scripts.
"""

from __future__ import annotations

from os import PathLike
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple


def _split_glob(pattern: Path) -> Tuple[Path, str, str]:
    """Split an absolute glob pattern into (root, relative glob, suffix).

    The suffix is everything after the last ``*`` in the file name — the part
    stripped off to form the matching key (e.g. ``image_*.nii.gz`` →
    suffix ``.nii.gz``).
    """
    pattern = Path(pattern)
    root = Path(pattern.anchor)
    rel = str(pattern.relative_to(root))
    suffix = pattern.name.rsplit("*")[-1]
    return root, rel, suffix


def find_matching_files(
    input_globs: List[Path], verbose: bool = True
) -> List[List[Path]]:
    """Pair files across N glob patterns by shared stem.

    The key for each file is its name with the glob's trailing suffix removed;
    only complete tuples (one file per glob) are returned.
    """
    root0, rel0, suffix0 = _split_glob(Path(input_globs[0]))
    groups: Dict[str, List[Path]] = {
        p.name.replace(suffix0, ""): [p] for p in root0.glob(rel0)
    }

    for pattern in input_globs[1:]:
        root_i, rel_i, suffix_i = _split_glob(Path(pattern))
        for p in root_i.glob(rel_i):
            key = p.name.replace(suffix_i, "")
            if key in groups:
                groups[key].append(p)
            elif verbose:
                print(f"No match found for {key} : {p}")

    complete = [paths for paths in groups.values() if len(paths) == len(input_globs)]
    if verbose:
        print(f"Number of files in {input_globs[0]}: {len(groups)}")
        print(f"Number of tuples: {len(complete)}\n")
    return complete


class FileIterator:
    """Iterate over files in a directory matching ``glob``.

    Optionally skip files whose name contains ``skip_string``.
    """

    def __init__(
        self,
        directory: PathLike,
        glob: str = "*.nii.gz",
        skip_string: Optional[str] = None,
    ):
        self.directory = Path(directory)
        self.glob = glob
        self.skip_string = skip_string

    def __iter__(self) -> Iterator[Path]:
        for p in sorted(self.directory.glob(self.glob)):
            if not p.is_file():
                continue
            if self.skip_string is not None and self.skip_string in p.name:
                continue
            yield p


class UniqueFileIterator:
    """Iterate over files present in directory1 but absent from directory2."""

    def __init__(
        self,
        directory1: PathLike,
        directory2: PathLike,
        glob1: str = "*.nii.gz",
        glob2: str = "*.nii.gz",
    ):
        self.directory1 = Path(directory1)
        self.directory2 = Path(directory2)
        self.glob1 = glob1
        self.glob2 = glob2

    def __iter__(self) -> Iterator[Path]:
        names2 = {p.name for p in self.directory2.glob(self.glob2) if p.is_file()}
        for p in sorted(self.directory1.glob(self.glob1)):
            if p.is_file() and p.name not in names2:
                yield p


class MatchingFileIterator:
    """Iterate over (file1, file2) pairs where file2's name contains file1's stem."""

    def __init__(
        self,
        directory1: PathLike,
        directory2: PathLike,
        glob1: str = "*.nii.gz",
    ):
        self.directory1 = Path(directory1)
        self.directory2 = Path(directory2)
        self.glob1 = glob1
        self.suffix = glob1.rsplit("*")[-1]

    def __iter__(self) -> Iterator[Tuple[Path, Path]]:
        for file1 in sorted(self.directory1.glob(self.glob1)):
            if not file1.is_file():
                continue
            stem = file1.name.replace(self.suffix, "")
            for file2 in sorted(self.directory2.glob(f"*{stem}*{self.suffix}")):
                if file2.is_file():
                    yield file1, file2
                    break
