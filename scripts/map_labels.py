"""Batch-remap label volumes with a named mapper or a json name-map.

Same mappers and flow as the reference tool (reference:
scripts/map_labels.py:15-121): the DRCMR 16-tissue head list, bone/fg/bg
groupings, vessel merging; writes remapped niftis + the new tissue list.
"""

import json
import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.image.labels import (
    build_tissue_mapping,
    load_tissue_list,
    save_tissue_list,
)
from segmantic_tpu.io.nifti import read_volume, write_volume

drcmr_labels_16 = [
    "Background", "Air_internal", "Artery", "Bone_cancellous", "Bone_cortical",
    "Cerebrospinal_fluid", "Cerebrum_grey_matter", "Cerebrum_white_matter",
    "Eyes", "Mucosa", "Other_tissues", "Rectus_muscles", "SAT", "Skin",
    "Spinal_cord", "Vein", "Visual_nerve",
]


def premap(name: str) -> str:
    return "Other_tissues" if name == "SAT" else name


def map_bone_fg_bg(name: str) -> str:
    if name.startswith("Bone_"):
        return "Bone"
    if name == "Background":
        return "Background"
    return "Head"


def map_bone_skin_air_fg_bg(name: str) -> str:
    if name.startswith("Bone_"):
        return "Bone"
    if name in ("Air_internal", "Skin", "Background"):
        return name
    return "Head"


def map_vessels2other(name: str) -> str:
    if name.startswith("Bone_"):
        return "Bone"
    if name in ("Vein", "Artery"):
        return "Other_tissues"
    return premap(name)


_NAMED_MAPPERS = {
    "map_bone_fg_bg": map_bone_fg_bg,
    "map_bone_skin_air_fg_bg": map_bone_skin_air_fg_bg,
    "map_vessels2other": map_vessels2other,
}


@click.command()
@click.argument("input_dir", type=click.Path(path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option("--input-tissues", type=click.Path(path_type=Path), default=None,
              help="input tissue list (default: DRCMR 16-tissue head list)")
@click.option("--input2output", type=str, required=True,
              help="mapper name (map_bone_fg_bg, map_bone_skin_air_fg_bg, "
                   "map_vessels2other) or a json file mapping tissue names")
def main(input_dir: Path, output_dir: Path, input_tissues, input2output: str):
    if input_tissues:
        imap = load_tissue_list(input_tissues)
    else:
        imap = {n: i for i, n in enumerate(drcmr_labels_16)}

    if Path(input2output).exists():
        name_map = json.loads(Path(input2output).read_text())
        mapper = lambda n: name_map[n]  # noqa: E731
    elif input2output in _NAMED_MAPPERS:
        mapper = _NAMED_MAPPERS[input2output]
    else:
        raise click.UsageError("Invalid mapping function specified")

    omap, lut = build_tissue_mapping(imap, mapper)
    output_dir.mkdir(parents=True, exist_ok=True)
    save_tissue_list(omap, output_dir / "labels.txt")

    for input_file in sorted(input_dir.glob("*.nii.gz")):
        vol = read_volume(input_file)
        mapped = lut[vol.numpy().astype(np.int64)]
        if len(np.unique(mapped)) != mapped.max() + 1:
            click.echo(f"warning: {input_file.name} has gaps in mapped labels")
        write_volume(output_dir / input_file.name, vol.with_data(mapped))
        click.echo(f"remapped {input_file.name}")


if __name__ == "__main__":
    main()
