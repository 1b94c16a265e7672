"""Build an MSD-style datalist json from image/label directories.

Same split policy as the reference tool (reference:
scripts/make_datalist.py:11-76): seeded shuffle, first 10 pairs become the
test set, 20% (scaled by ``--percent``) validation, labels from a tissue
list or a class count, ``--test-only`` mode.
"""

import json
import random
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.image.labels import load_tissue_list
from segmantic_tpu.utils.file_iterators import find_matching_files


@click.command()
@click.option("--data-dir", type=click.Path(path_type=Path), required=True,
              help="root data dir; datalist paths are relative to it")
@click.option("--image-dir", type=click.Path(path_type=Path), required=True)
@click.option("--labels-dir", type=click.Path(path_type=Path), default=None)
@click.option("--datalist-path", type=click.Path(path_type=Path), required=True)
@click.option("--num-channels", type=int, default=1)
@click.option("--num-classes", type=int, default=-1)
@click.option("--tissuelist-path", type=click.Path(path_type=Path), default=None)
@click.option("--percent", type=float, default=1.0)
@click.option("--description", type=str, default="")
@click.option("--image-glob", type=str, default="*.nii.gz")
@click.option("--labels-glob", type=str, default="*.nii.gz")
@click.option("--test-only", is_flag=True, default=False)
@click.option("--seed", type=int, default=104)
def main(
    data_dir, image_dir, labels_dir, datalist_path, num_channels, num_classes,
    tissuelist_path, percent, description, image_glob, labels_glob, test_only, seed,
):
    if tissuelist_path is not None:
        tissuelist = load_tissue_list(tissuelist_path)
        labels = {str(i): n for n, i in tissuelist.items() if i != 0}
    elif num_classes > 0:
        labels = {str(i): f"tissue{i:02d}" for i in range(1, num_classes + 1)}
    else:
        raise click.UsageError("Either specify 'tissuelist-path' or 'num-classes'")

    data_config = {
        "description": description,
        "num_channels": num_channels,
        "labels": labels,
    }

    if test_only:
        test_files = sorted((data_dir / image_dir).glob(image_glob))
        data_config["training"] = []
        data_config["validation"] = []
        data_config["test"] = [str(f.relative_to(data_dir)) for f in test_files]
    else:
        matches = find_matching_files(
            [data_dir / image_dir / image_glob, data_dir / labels_dir / labels_glob],
            verbose=False,
        )
        pairs = [
            (p[0].relative_to(data_dir), p[1].relative_to(data_dir)) for p in matches
        ]
        random.Random(seed).shuffle(pairs)
        # split arithmetic (behavior parity with the reference datalist
        # builder): the first 10 shuffled cases are held out as the test
        # set; a `percent`-scaled 20% of the remainder validates. Below
        # percent=1 the training split shrinks in proportion (4 training
        # cases per validation case) rather than absorbing the leftovers.
        n_test = 10
        test = pairs[:n_test]
        pool = pairs[n_test:]
        num_valid = int(0.2 * percent * len(pool))
        if percent >= 1.0:
            num_training = len(pool) - num_valid
        else:
            num_training = 4 * num_valid

        data_config["training"] = [
            {"image": str(im), "label": str(lb)}
            for im, lb in pool[:num_training]
        ]
        data_config["validation"] = [
            {"image": str(im), "label": str(lb)}
            for im, lb in pool[len(pool) - num_valid:]
        ] if num_valid else []
        data_config["test"] = [str(im) for im, _ in test]

    datalist_path.write_text(json.dumps(data_config, indent=2))
    n_cases = sum(len(data_config[k]) for k in ("training", "validation", "test"))
    if n_cases == 0:
        click.echo(
            "warning: no image/label pairs matched — check that --image-dir/"
            "--labels-dir are relative to --data-dir and the globs are right",
            err=True,
        )
    click.echo(f"wrote {datalist_path}")


if __name__ == "__main__":
    main()
