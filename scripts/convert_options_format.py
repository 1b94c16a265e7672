"""Convert a config file between yaml and json.

(reference: scripts/convert_options_format.py:8-23)
"""

import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.utils import config


@click.command()
@click.argument("input_file", type=click.Path(path_type=Path))
@click.argument("output_file", type=click.Path(path_type=Path))
def main(input_file: Path, output_file: Path):
    config.dump(config.load(input_file), output_file)
    click.echo(f"wrote {output_file}")


if __name__ == "__main__":
    main()
