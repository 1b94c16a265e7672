"""Check image/label size + spacing/origin consistency (optional fix).

(reference: scripts/check_training_data.py:11-28)
"""

import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.io.nifti import read_volume, write_volume
from segmantic_tpu.utils.file_iterators import find_matching_files


@click.command()
@click.argument("image_dir", type=click.Path(path_type=Path))
@click.argument("labels_dir", type=click.Path(path_type=Path))
@click.option("--copy-image-information", is_flag=True, default=False,
              help="overwrite the label geometry with the image geometry")
def main(image_dir: Path, labels_dir: Path, copy_image_information: bool):
    matches = find_matching_files(
        [image_dir / "*.nii.gz", labels_dir / "*.nii.gz"], verbose=False
    )
    for img_path, lbl_path in matches:
        img = read_volume(img_path)
        lbl = read_volume(lbl_path)
        if img.spatial_shape != lbl.spatial_shape:
            click.echo(
                f"Size mismatch {img_path.name}: "
                f"{img.spatial_shape} != {lbl.spatial_shape}"
            )
            continue
        if copy_image_information:
            fixed = lbl.with_data(lbl.numpy().astype(np.uint8), img.affine.copy())
            write_volume(lbl_path, fixed)
            click.echo(f"fixed geometry of {lbl_path.name}")
        elif not np.allclose(img.affine, lbl.affine, atol=1e-2):
            click.echo(f"Geometry mismatch {img_path.name}:")
            click.echo(f"  image affine:\n{img.affine}")
            click.echo(f"  label affine:\n{lbl.affine}")


if __name__ == "__main__":
    main()
