"""i2i data pipeline + CLI: paired volumes → slice batches → train →
whole-volume translation (BASELINE config #5 end-to-end)."""

from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from segmantic_tpu.commands.i2i_cli import app
from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.i2i.data import (
    PairedSliceDataset,
    load_generator,
    scale_to_tanh,
    translate_volume,
    unscale_from_tanh,
)
from segmantic_tpu.io.nifti import read_volume, write_volume


def _make_pair(root: Path, name: str, shape=(18, 14, 6), seed=0):
    rng = np.random.default_rng(seed)
    t1 = rng.uniform(0, 800, shape).astype(np.float32)
    t2 = 1000.0 - t1  # a deterministic "style" relation
    aff = affine_from_spacing_origin((1.0, 1.2, 2.0))
    src = root / f"{name}_t1.nii.gz"
    dst = root / f"{name}_t2.nii.gz"
    write_volume(src, Volume(t1[None], aff))
    write_volume(dst, Volume(t2[None], aff))
    return src, dst


def test_scale_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.uniform(-50, 700, (9, 9, 9)).astype(np.float32)
    y, win = scale_to_tanh(x, low_pct=0.0, high_pct=100.0)
    assert y.min() >= -1.0 and y.max() <= 1.0
    np.testing.assert_allclose(unscale_from_tanh(y, win), x, rtol=1e-5, atol=1e-2)


def test_paired_slice_dataset(tmp_path: Path):
    pairs = [
        _make_pair(tmp_path, "a", seed=0),
        _make_pair(tmp_path, "b", shape=(20, 12, 4), seed=1),
    ]
    ds = PairedSliceDataset(pairs, batch_size=4, axis=2, seed=7)
    # static /4-divisible slice geometry spanning both volumes
    assert all(s % 4 == 0 for s in ds.slice_shape)
    assert ds.num_slices == 10
    b0 = list(ds)
    b1 = list(ds)
    assert len(b0) == len(ds) and len(b0) >= 2
    for src, dst in b0:
        assert src.shape == (4,) + ds.slice_shape + (1,)
        assert dst.shape == src.shape
        assert src.min() >= -1.0 and src.max() <= 1.0
    # epochs reshuffle (restartable iterable, new order each pass)
    assert not all(np.array_equal(a[0], b[0]) for a, b in zip(b0, b1))
    # windows recorded for inference-time unscaling
    assert ds.source_window[1] > ds.source_window[0]
    assert ds.target_window[1] > ds.target_window[0]


def test_paired_shuffle_keeps_correspondence(tmp_path: Path):
    src, _ = _make_pair(tmp_path, "c", seed=2)
    ds = PairedSliceDataset([(src, src)], batch_size=3, axis=2, seed=1)
    for a, b in ds:
        np.testing.assert_array_equal(a, b)  # same file, same shuffle order


def test_unpaired_shuffle_differs(tmp_path: Path):
    src, _ = _make_pair(tmp_path, "d", shape=(16, 16, 8), seed=4)
    ds = PairedSliceDataset([(src, src)], batch_size=8, axis=2, seed=1,
                            paired=False)
    batches = list(ds)
    assert any(not np.array_equal(a, b) for a, b in batches)


def test_dataset_resamples_source_onto_target_grid(tmp_path: Path):
    rng = np.random.default_rng(5)
    aff_t2 = affine_from_spacing_origin((1.0, 1.0, 2.0))
    aff_t1 = affine_from_spacing_origin((2.0, 2.0, 2.0))  # coarser source
    t2 = rng.uniform(0, 100, (16, 16, 5)).astype(np.float32)
    t1 = rng.uniform(0, 100, (8, 8, 5)).astype(np.float32)
    write_volume(tmp_path / "e_t1.nii.gz", Volume(t1[None], aff_t1))
    write_volume(tmp_path / "e_t2.nii.gz", Volume(t2[None], aff_t2))
    ds = PairedSliceDataset(
        [(tmp_path / "e_t1.nii.gz", tmp_path / "e_t2.nii.gz")],
        batch_size=2, axis=2, min_content=0.0,
    )
    assert ds.src.shape == ds.dst.shape  # source landed on the target grid


def test_translate_volume_geometry_and_window(tmp_path: Path):
    src, _ = _make_pair(tmp_path, "f", shape=(10, 14, 5), seed=6)
    vol = read_volume(src)
    out = translate_volume(
        lambda x: x, vol, axis=2, batch_size=4,
        output_window=(0.0, 10.0),
    )
    assert out.spatial_shape == vol.spatial_shape
    np.testing.assert_array_equal(out.affine, vol.affine)
    assert 0.0 <= float(out.numpy().min()) and float(out.numpy().max()) <= 10.0


def test_i2i_cli_end_to_end(tmp_path: Path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for i in range(2):
        _make_pair(data_dir, f"case{i}", shape=(12, 12, 4), seed=i)
    out_dir = tmp_path / "run"
    runner = CliRunner()
    result = runner.invoke(app, [
        "pix2pix",
        "-s", str(data_dir / "*_t1.nii.gz"),
        "-t", str(data_dir / "*_t2.nii.gz"),
        "-r", str(out_dir),
        "--steps", "3", "--batch-size", "4",
        "--base-features", "4", "--n-blocks", "1",
        "--log-every", "1",
    ])
    assert result.exit_code == 0, result.output
    ckpt = out_dir / "pix2pix_generator.ckpt"
    assert ckpt.exists()

    # the checkpoint alone rebuilds the generator + its windows
    apply_fn, hparams = load_generator(ckpt)
    assert hparams["slice_axis"] == 2
    assert len(hparams["target_window"]) == 2

    trans_dir = tmp_path / "translated"
    result = runner.invoke(app, [
        "translate",
        "-m", str(ckpt),
        "-i", str(data_dir / "case0_t1.nii.gz"),
        "-r", str(trans_dir),
    ])
    assert result.exit_code == 0, result.output
    outs = list(trans_dir.glob("*.nii.gz"))
    assert len(outs) == 1 and "translated" in outs[0].name
    moved = read_volume(outs[0])
    assert moved.spatial_shape == (12, 12, 4)
    # outputs were mapped back into the training target window
    lo, hi = hparams["target_window"]
    assert moved.numpy().min() >= lo - 1e-3 and moved.numpy().max() <= hi + 1e-3


def test_unpaired_slice_dataset(tmp_path: Path):
    rng = np.random.default_rng(11)
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    # deliberately non-matching stems and different shapes per domain
    a = tmp_path / "subjA.nii.gz"
    b = tmp_path / "scan99.nii.gz"
    write_volume(a, Volume(rng.uniform(0, 5, (10, 12, 4)).astype(np.float32)[None], aff))
    write_volume(b, Volume(rng.uniform(0, 9, (14, 8, 6)).astype(np.float32)[None], aff))
    from segmantic_tpu.i2i.data import UnpairedSliceDataset

    ds = UnpairedSliceDataset([a], [b], batch_size=3, axis=2, min_content=0.0)
    assert all(s % 4 == 0 for s in ds.slice_shape)
    batches = list(ds)
    assert batches, "expected at least one batch"
    for xa, xb in batches:
        assert xa.shape == (3,) + ds.slice_shape + (1,)
        assert xb.shape == xa.shape


def test_cyclegan_cli_smoke(tmp_path: Path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # unpaired domains: stems deliberately do NOT match
    rng = np.random.default_rng(9)
    aff = affine_from_spacing_origin((1.0, 1.0, 2.0))
    for i in range(2):
        write_volume(
            data_dir / f"domA_{i}.nii.gz",
            Volume(rng.uniform(0, 800, (12, 12, 4)).astype(np.float32)[None], aff),
        )
        write_volume(
            data_dir / f"other{i}_B.nii.gz",
            Volume(rng.uniform(0, 400, (12, 12, 4)).astype(np.float32)[None], aff),
        )
    out_dir = tmp_path / "cg"
    result = CliRunner().invoke(app, [
        "cyclegan",
        "-s", str(data_dir / "domA_*.nii.gz"),
        "-t", str(data_dir / "other*_B.nii.gz"),
        "-r", str(out_dir),
        "--steps", "2", "--batch-size", "2",
        "--base-features", "4", "--n-blocks", "1",
        "--log-every", "1",
    ])
    assert result.exit_code == 0, result.output
    ckpt = out_dir / "cyclegan_generators.ckpt"
    assert ckpt.exists()
    apply_ba, hparams = load_generator(ckpt, direction="ba")
    assert hparams["model"] == "cyclegan"
    y = apply_ba(np.zeros((1, 12, 12, 1), np.float32))
    assert y.shape == (1, 12, 12, 1)
