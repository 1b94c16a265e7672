"""Strip a training checkpoint down to raw model weights.

(reference: scripts/extract_unet.py:7-18 strips the Lightning wrapper to a
raw state_dict; here: drop optimizer state/metrics, keep variables+hparams.)
"""

import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.train.checkpoint import load_checkpoint, save_checkpoint


@click.command()
@click.argument("input_ckpt", type=click.Path(path_type=Path))
@click.argument("output_ckpt", type=click.Path(path_type=Path))
def main(input_ckpt: Path, output_ckpt: Path):
    ckpt = load_checkpoint(input_ckpt)
    save_checkpoint(
        output_ckpt,
        ckpt["variables"],
        hparams=ckpt["hparams"],
        metrics=ckpt["metrics"],
        opt_state=None,
    )
    click.echo(f"wrote weights-only checkpoint {output_ckpt}")


if __name__ == "__main__":
    main()
