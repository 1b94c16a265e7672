"""Extract per-label surfaces from a label map and write PLY meshes.

(reference: scripts/visualize_label_surfaces.py:14-69, which used VTK
FlyingEdges + DecimatePro; here the native marching-tetrahedra isosurface
mesher with Laplacian smoothing and quadric-error decimation.)
"""

import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu import native
from segmantic_tpu.io.nifti import read_volume


@click.command()
@click.argument("labelmap", type=click.Path(path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option("--labels", type=int, multiple=True, default=(),
              help="label ids to extract (default: all nonzero)")
@click.option("--smooth-iters", type=int, default=10)
@click.option("--method",
              type=click.Choice(["marching", "surface_net", "voxel"]),
              default="marching")
@click.option("--decimate", type=float, default=0.8,
              help="fraction of triangles to remove (DecimatePro-style)")
def main(labelmap: Path, output_dir: Path, labels: tuple, smooth_iters: int,
         method: str, decimate: float):
    vol = read_volume(labelmap)
    data = vol.numpy()[0]
    output_dir.mkdir(parents=True, exist_ok=True)
    ids = list(labels) if labels else [int(v) for v in np.unique(data) if v != 0]
    for label_id in ids:
        verts, tris = native.extract_label_surface(
            data, vol.affine, label_id, smooth_iters=smooth_iters,
            method=method, decimate=decimate,
        )
        out = output_dir / f"{labelmap.name.replace('.nii.gz', '')}_label{label_id}.ply"
        native.write_ply(out, verts, tris)
        click.echo(f"label {label_id}: {len(verts)} verts, {len(tris)} tris -> {out}")


if __name__ == "__main__":
    main()
