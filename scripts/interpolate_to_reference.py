"""Resample an image onto a reference grid.

(reference: scripts/interpolate_to_reference.py:1-8)
"""

import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.image.processing import resample_to_ref
from segmantic_tpu.io.nifti import read_volume, write_volume


@click.command()
@click.argument("moving", type=click.Path(path_type=Path))
@click.argument("fixed", type=click.Path(path_type=Path))
@click.argument("output", type=click.Path(path_type=Path))
@click.option("--nearest", is_flag=True, default=False,
              help="nearest-neighbor interpolation (for label maps)")
def main(moving: Path, fixed: Path, output: Path, nearest: bool):
    out = resample_to_ref(read_volume(moving), read_volume(fixed), nearest=nearest)
    write_volume(output, out)
    click.echo(f"wrote {output}")


if __name__ == "__main__":
    main()
