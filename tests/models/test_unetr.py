"""UNETR: shapes, trainability, constraints, and trainer integration."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.models.unetr import UNETR

TINY = dict(hidden_size=32, num_layers=4, num_heads=4, mlp_dim=64,
            feature_size=4)


def test_forward_shape_and_taps():
    m = UNETR(in_channels=1, out_channels=3, **TINY)
    x = jnp.zeros((2, 32, 32, 32, 1))
    v = m.init(jax.random.key(0), x, training=False)
    y = m.apply(v, x, training=False)
    assert y.shape == (2, 32, 32, 32, 3)
    # taps at L/4 steps: encoder2/3/4 branches exist in the param tree
    for name in ("encoder1", "encoder2_up_0", "encoder3_up_0",
                 "encoder4_up_0", "decoder5_up", "out"):
        assert name in v["params"], sorted(v["params"])[:8]


def test_gradients_flow_everywhere():
    m = UNETR(in_channels=1, out_channels=2, **TINY)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 32, 1)), jnp.float32)
    v = m.init(jax.random.key(0), x, training=False)

    def loss(p):
        return jnp.mean(m.apply({"params": p}, x, training=True) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)
    assert nonzero >= 0.9 * len(leaves), (nonzero, len(leaves))


def test_rejects_bad_inputs():
    m = UNETR(in_channels=1, out_channels=2, **TINY)
    with pytest.raises(ValueError, match="divisible"):
        m.init(jax.random.key(0), jnp.zeros((1, 24, 32, 32, 1)))
    with pytest.raises(ValueError, match="patch_size=16"):
        UNETR(patch_size=8, **TINY).init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    # phase logits exist only on the lane-packed path (r5)
    os.environ["SEGMANTIC_UNETR_PACK"] = "off"
    try:
        with pytest.raises(ValueError, match="phase logits"):
            v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
            m.apply(v, jnp.zeros((1, 32, 32, 32, 1)), phase_logits=True)
        assert m.phase_top_ok() is False
    finally:
        os.environ.pop("SEGMANTIC_UNETR_PACK", None)
    assert m.phase_top_ok() is True  # packed default emits a phase head


def test_trainer_create_unetr():
    from segmantic_tpu.train.trainer import SegmentationModel

    model = SegmentationModel.create(
        num_classes=2, spatial_dims=3, spatial_size=[32, 32, 32],
        arch="unetr", arch_params=TINY,
    )
    assert model.hparams["arch"] == "unetr"
    x = jnp.zeros((1, 32, 32, 32, 1))
    y = model.apply(x)
    assert y.shape == (1, 32, 32, 32, 2)
    with pytest.raises(ValueError, match="spatial_size"):
        SegmentationModel.create(
            num_classes=2, spatial_dims=3, arch="unetr", arch_params=TINY,
        )


def test_unetr_checkpoint_roundtrip(tmp_path):
    """save -> load rebuilds the UNETR from hparams (arch + arch_params)
    and reproduces the forward bit-for-bit."""
    from segmantic_tpu.train.checkpoint import save_checkpoint
    from segmantic_tpu.train.trainer import SegmentationModel

    model = SegmentationModel.create(
        num_classes=2, spatial_dims=3, spatial_size=[32, 32, 32],
        arch="unetr", arch_params=TINY,
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 32, 32, 32, 1)), jnp.float32)
    y0 = np.asarray(model.apply(x))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, model.variables, hparams=model.hparams)
    loaded = SegmentationModel.load(ckpt)
    assert loaded.hparams["arch"] == "unetr"
    np.testing.assert_array_equal(np.asarray(loaded.apply(x)), y0)
