"""Batch Dice/FN/FP/Hausdorff evaluation → CSV.

(reference: scripts/evaluate_segmentations.py:10-66, which used ITK's
LabelOverlapMeasures/HausdorffDistance filters; here the shared
confusion-matrix + EDT metrics.) Per-label ids configurable instead of the
reference's hard-coded skull/vertebra pair.
"""

import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.io.nifti import read_volume
from segmantic_tpu.metrics.distance import hausdorff_surface_distance
from segmantic_tpu.metrics.overlap import confusion_matrix


@click.command()
@click.argument("input_dir", type=click.Path(path_type=Path))
@click.argument("reference_dir", type=click.Path(path_type=Path))
@click.argument("output_file", type=click.Path(path_type=Path))
@click.option("--input-glob", type=str, default="*.nii.gz")
@click.option("--label-ids", type=int, multiple=True, default=(1, 2),
              help="label ids to evaluate (default: 1=skull, 2=vertebra)")
def main(input_dir: Path, reference_dir: Path, output_file: Path, input_glob: str,
         label_ids: tuple):
    header = ["name"]
    for lid in label_ids:
        header += [
            f"dice ({lid})", f"fn ({lid})", f"fp ({lid})",
            f"hausdorff ({lid})", f"mean hausdorff ({lid})",
        ]
    rows = []

    for input_file in sorted(input_dir.glob(input_glob)):
        ref_file = reference_dir / input_file.name
        if not ref_file.exists():
            continue
        pred_vol = read_volume(input_file)
        ref_vol = read_volume(ref_file)
        pred = pred_vol.numpy()[0].astype(np.int64)
        ref = ref_vol.numpy()[0].astype(np.int64)
        spacing = ref_vol.spacing

        vals = []
        num_classes = int(max(pred.max(), ref.max())) + 1
        cm = np.asarray(confusion_matrix(num_classes, ref, pred), np.float64)
        for lid in label_ids:
            if lid >= num_classes:
                vals += ["nan"] * 5
                continue
            tp = cm[lid, lid]
            fn = cm[lid].sum() - tp
            fp = cm[:, lid].sum() - tp
            denom_ref = cm[lid].sum()
            denom_pred = cm[:, lid].sum()
            dice = 2 * tp / max(denom_ref + denom_pred, 1)
            fn_rate = fn / max(denom_ref, 1)
            fp_rate = fp / max(denom_pred, 1)
            hd = hausdorff_surface_distance(pred == lid, ref == lid, spacing=spacing)
            vals += [
                f"{dice:.4f}", f"{fn_rate:.4f}", f"{fp_rate:.4f}",
                f"{hd['max']:.4f}", f"{hd['mean']:.4f}",
            ]
        name = input_file.name.replace(".nii.gz", "")
        rows.append([name] + vals)

    if not rows:
        raise click.ClickException("No pairs found. Nothing to evaluate")

    with open(output_file, "w") as f:
        print(", ".join(header), file=f)
        for row in rows:
            print(", ".join(row), file=f)
    click.echo(f"wrote {output_file} ({len(rows)} cases)")


if __name__ == "__main__":
    main()
