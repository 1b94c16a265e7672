"""Ops-script CLI coverage: each tool runs end-to-end on tiny data."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.image.labels import save_tissue_list
from segmantic_tpu.io.nifti import read_volume, write_volume

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def pairs(tmp_path):
    img_dir, lbl_dir = tmp_path / "image", tmp_path / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    for i in range(12):
        lbl = np.zeros((10, 10, 10), np.uint8)
        lbl[3:7, 3:7, 3:7] = 1
        lbl[4:6, 4:6, 4:6] = 2
        img = rng.standard_normal((10, 10, 10)).astype(np.float32)
        write_volume(img_dir / f"c{i:02d}.nii.gz", Volume(data=img[None], affine=aff))
        write_volume(lbl_dir / f"c{i:02d}.nii.gz", Volume(data=lbl[None], affine=aff.copy()))
    return tmp_path, img_dir, lbl_dir


def test_make_datalist(pairs):
    root, img_dir, lbl_dir = pairs
    mod = _load("make_datalist")
    out = root / "datalist.json"
    result = CliRunner().invoke(
        mod.main,
        ["--data-dir", str(root), "--image-dir", "image", "--labels-dir", "label",
         "--datalist-path", str(out), "--num-classes", "2"],
    )
    assert result.exit_code == 0, result.output
    data = json.loads(out.read_text())
    # 12 pairs: 10 test, 2 remaining -> val = int(0.2*2) = 0
    assert len(data["test"]) == 10
    assert len(data["training"]) + len(data["validation"]) == 2
    assert data["labels"]["1"] == "tissue01"


def test_make_datalist_test_only(pairs):
    root, img_dir, lbl_dir = pairs
    mod = _load("make_datalist")
    out = root / "test_only.json"
    result = CliRunner().invoke(
        mod.main,
        ["--data-dir", str(root), "--image-dir", "image",
         "--datalist-path", str(out), "--num-classes", "2", "--test-only"],
    )
    assert result.exit_code == 0, result.output
    data = json.loads(out.read_text())
    assert len(data["test"]) == 12 and data["training"] == []


def test_map_labels(pairs, tmp_path):
    root, img_dir, lbl_dir = pairs
    mod = _load("map_labels")
    tissues = tmp_path / "tissues.txt"
    save_tissue_list({"Bone_a": 1, "Skin": 2}, tissues)
    name_map = tmp_path / "map.json"
    name_map.write_text(json.dumps({"Background": "Background", "Bone_a": "Bone", "Skin": "Bone"}))
    out_dir = tmp_path / "mapped"
    result = CliRunner().invoke(
        mod.main,
        [str(lbl_dir), str(out_dir), "--input-tissues", str(tissues),
         "--input2output", str(name_map)],
    )
    assert result.exit_code == 0, result.output
    assert (out_dir / "labels.txt").exists()
    mapped = read_volume(out_dir / "c00.nii.gz").numpy()
    assert set(np.unique(mapped)) <= {0, 1}


def test_check_training_data(pairs):
    root, img_dir, lbl_dir = pairs
    mod = _load("check_training_data")
    result = CliRunner().invoke(mod.main, [str(img_dir), str(lbl_dir)])
    assert result.exit_code == 0, result.output


def test_check_masks_fix(tmp_path):
    mod = _load("check_masks")
    sloppy = (np.random.default_rng(0).random((6, 6, 6)) * 0.9 + 0.2).astype(np.float32)
    write_volume(tmp_path / "m.nii.gz", Volume(data=sloppy[None]))
    result = CliRunner().invoke(mod.main, [str(tmp_path), "--fix"])
    assert result.exit_code == 0, result.output
    fixed = read_volume(tmp_path / "m.nii.gz").numpy()
    assert set(np.unique(fixed)) <= {0, 1}


def test_evaluate_segmentations(pairs, tmp_path):
    root, img_dir, lbl_dir = pairs
    mod = _load("evaluate_segmentations")
    out = tmp_path / "eval.csv"
    result = CliRunner().invoke(
        mod.main, [str(lbl_dir), str(lbl_dir), str(out)]
    )
    assert result.exit_code == 0, result.output
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 13  # header + 12 cases
    # self-comparison: dice 1.0 for label 1
    assert ", 1.0000," in lines[1]


def test_convert_options_format(tmp_path):
    mod = _load("convert_options_format")
    src = tmp_path / "a.yml"
    src.write_text("a: 1\nb: [1, 2]\n")
    dst = tmp_path / "a.json"
    result = CliRunner().invoke(mod.main, [str(src), str(dst)])
    assert result.exit_code == 0, result.output
    assert json.loads(dst.read_text()) == {"a": 1, "b": [1, 2]}


def test_interpolate_to_reference(pairs, tmp_path):
    root, img_dir, lbl_dir = pairs
    mod = _load("interpolate_to_reference")
    moving = img_dir / "c00.nii.gz"
    fixed = tmp_path / "ref.nii.gz"
    write_volume(
        fixed,
        Volume(data=np.zeros((1, 5, 5, 5), np.float32),
               affine=affine_from_spacing_origin((2.0, 2.0, 2.0))),
    )
    out = tmp_path / "resampled.nii.gz"
    result = CliRunner().invoke(mod.main, [str(moving), str(fixed), str(out)])
    assert result.exit_code == 0, result.output
    assert read_volume(out).spatial_shape == (5, 5, 5)


def test_extract_unet(tmp_path):
    mod = _load("extract_unet")
    from segmantic_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    src = tmp_path / "full.ckpt"
    save_checkpoint(
        src,
        {"params": {"w": np.zeros(2, np.float32)}},
        {"num_classes": 2},
        metrics={"val_dice": 0.5},
        opt_state={"momentum": np.zeros(2, np.float32)},
    )
    dst = tmp_path / "weights.ckpt"
    result = CliRunner().invoke(mod.main, [str(src), str(dst)])
    assert result.exit_code == 0, result.output
    back = load_checkpoint(dst)
    assert "opt_state" not in back
    assert back["hparams"]["num_classes"] == 2


def test_visualize_label_surfaces(pairs, tmp_path):
    from segmantic_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    root, img_dir, lbl_dir = pairs
    mod = _load("visualize_label_surfaces")
    out_dir = tmp_path / "meshes"
    result = CliRunner().invoke(
        mod.main, [str(lbl_dir / "c00.nii.gz"), str(out_dir)]
    )
    assert result.exit_code == 0, result.output
    plys = list(out_dir.glob("*.ply"))
    assert len(plys) == 2  # labels 1 and 2
    assert plys[0].read_text().startswith("ply")
