import math
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from segmantic_tpu.train.checkpoint import (
    TopKCheckpoints,
    checkpoint_filename,
    load_checkpoint,
    parse_val_dice,
    save_checkpoint,
)
from segmantic_tpu.train.optim import LRScheduler, make_optimizer, set_learning_rate


def test_optimizer_factory_variants():
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    for cfg in [
        {"optimizer": "Adam", "lr": 1e-3},
        {"optimizer": "Adam", "lr": 1e-3, "amsgrad": True},
        {"optimizer": "SGD", "lr": 1e-2, "momentum": 0.9},
        {"optimizer": "AdaBelief", "lr": 1e-3, "epsilon": 1e-16},
    ]:
        opt = make_optimizer(cfg)
        state = opt.init(params)
        updates, state = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(new["w"][0]) < 1.0


def test_set_learning_rate_changes_updates():
    params = {"w": jnp.ones(())}
    opt = make_optimizer({"optimizer": "SGD", "lr": 0.1, "momentum": 0.0})
    state = opt.init(params)
    state = set_learning_rate(state, 0.5)
    updates, _ = opt.update({"w": jnp.ones(())}, state, params)
    assert float(updates["w"]) == pytest.approx(-0.5)


def test_scheduler_constant():
    s = LRScheduler(1e-3, {"scheduler": "Constant"})
    assert s.step(0.5) == 1e-3
    assert s.step(0.4) == 1e-3


def test_scheduler_plateau():
    s = LRScheduler(1.0, {"scheduler": "ReduceOnPlateau", "factor": 0.5, "patience": 2})
    assert s.step(1.0) == 1.0  # first sets best
    assert s.step(1.0) == 1.0  # bad 1
    assert s.step(1.0) == 1.0  # bad 2
    assert s.step(1.0) == 0.5  # bad 3 > patience -> reduce
    assert s.step(0.1) == 0.5  # improvement


def test_scheduler_cosine():
    s = LRScheduler(1.0, {"scheduler": "Cosine", "T_0": 4, "T_multi": 1})
    lrs = [s.step() for _ in range(8)]
    assert lrs[3] == pytest.approx(1.0)  # restart at epoch 4 (t=0)
    assert min(lrs) >= 0.0
    assert max(lrs) <= 1.0
    s2 = LRScheduler(1.0, {"scheduler": "Cosine", "T_0": 2, "T_multi": 2})
    for _ in range(10):
        assert 0.0 <= s2.step() <= 1.0


def test_checkpoint_roundtrip(tmp_path: Path):
    variables = {
        "params": {"conv": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)}},
        "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
    }
    hparams = {"num_classes": 3, "channels": [4, 8]}
    p = tmp_path / checkpoint_filename(7, 0.123, 0.8765)
    save_checkpoint(p, variables, hparams, metrics={"val_dice": 0.8765})
    assert parse_val_dice(p) == pytest.approx(0.8765)
    back = load_checkpoint(p)
    assert back["hparams"] == hparams
    np.testing.assert_array_equal(
        back["variables"]["params"]["conv"]["kernel"],
        variables["params"]["conv"]["kernel"],
    )


def test_topk_checkpoints(tmp_path: Path):
    mgr = TopKCheckpoints(tmp_path, k=2)
    variables = {"params": {"w": np.zeros(2, np.float32)}}
    mgr.update(0, 1.0, 0.5, variables, {})
    mgr.update(1, 0.9, 0.7, variables, {})
    mgr.update(2, 0.8, 0.6, variables, {})
    assert len(list(tmp_path.glob("*.ckpt"))) == 2
    kept_dices = sorted(d for d, _ in mgr.kept)
    assert kept_dices == [0.6, 0.7]
    assert parse_val_dice(mgr.best) == pytest.approx(0.7)
    # worse than all kept -> rejected
    assert mgr.update(3, 0.7, 0.1, variables, {}) is None


def test_last_ckpt_written_and_resumable(tmp_path: Path):
    # covered end-to-end by trainer tests; here the save/load contract
    from segmantic_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    variables = {"params": {"w": np.ones(3, np.float32)}}
    save_checkpoint(tmp_path / "last.ckpt", variables, {"num_classes": 2},
                    metrics={"epoch": 5, "val_dice": 0.5})
    back = load_checkpoint(tmp_path / "last.ckpt")
    assert back["metrics"]["epoch"] == 5
    assert back["hparams"]["num_classes"] == 2


def test_legacy_sidecar_json_settings(tmp_path: Path):
    """A <ckpt>.json next to the checkpoint overrides in-file hparams
    (reference: src/segmantic/seg/monai_unet.py:564-569)."""
    import json
    import warnings

    from segmantic_tpu.train.trainer import SegmentationModel

    model = SegmentationModel.create(
        num_classes=2, spatial_dims=2, channels=(4, 8), strides=(2,), num_res_units=1
    )
    p = tmp_path / "model.ckpt"
    save_checkpoint(p, model.variables, dict(model.hparams, num_res_units=999))
    sidecar = p.with_suffix(".json")
    sidecar.write_text(json.dumps({"num_res_units": 1}))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        loaded = SegmentationModel.load(p)
    assert any("legacy model settings" in str(w.message) for w in caught)
    assert loaded.module.num_res_units == 1


def test_tensorboard_missing_warns(monkeypatch, tmp_path: Path):
    """A missing tensorboardX must warn, not silently drop scalar logs."""
    import builtins
    import warnings

    from segmantic_tpu.train.trainer import _make_tb_writer

    real_import = builtins.__import__

    def block_tbx(name, *args, **kwargs):
        if name.startswith("tensorboardX"):
            raise ImportError("tensorboardX blocked for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", block_tbx)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        writer = _make_tb_writer(tmp_path)
    assert writer is None
    assert any("tensorboardX unavailable" in str(w.message) for w in caught)
