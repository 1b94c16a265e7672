"""Binarize sloppy masks / report value ranges and float dtypes.

(reference: scripts/check_masks.py:9-43)
"""

import logging
import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.io.nifti import read_volume, write_volume

logger = logging.getLogger("check_masks")


def fix_binary_masks(directory: Path, file_glob: str = "*.nii.gz") -> None:
    """Force masks to clean {0,1} uint8 (threshold at 0.5)."""
    for file_path in sorted(directory.glob(file_glob)):
        vol = read_volume(file_path)
        data = vol.numpy().astype(np.float64)
        max_value = data.max()
        if max_value == 0:
            logger.error("%s mask is empty", file_path)
            continue
        min_value = data[data != 0].min()
        if min_value < 1 or max_value != 1:
            mask = (data > 0.5).astype(np.uint8)
            write_volume(file_path, vol.with_data(mask))
            logger.warning(
                "%s foreground values in range [%s,%s] — binarized",
                file_path, min_value, max_value,
            )


@click.command()
@click.argument("input_dir", type=click.Path(path_type=Path))
@click.option("--fix", is_flag=True, default=False, help="binarize sloppy masks")
def main(input_dir: Path, fix: bool):
    """Report suspicious mask value ranges / dtypes (optionally fix)."""
    logging.basicConfig(level=logging.INFO)
    if fix:
        fix_binary_masks(input_dir)
        return
    for f in sorted(input_dir.glob("*.nii.gz")):
        vol = read_volume(f)
        data = vol.numpy()
        vmin, vmax = data.min(), data.max()
        if vmin < 0 or vmax > 3:
            click.echo(f"{f.name}: [{vmin}, {vmax}]")
        if np.issubdtype(data.dtype, np.floating):
            click.echo(f"{f.name}: {data.dtype}")


if __name__ == "__main__":
    main()
