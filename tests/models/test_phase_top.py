"""Phase-space top decoder stage == ordinary layout, in train AND eval.

The flax UNet runs its top (convT + residual-unit) stage phase-major when
eligible (models/unet.py::_phase_top_ok). Same param tree, same function:
outputs, gradients, and BatchNorm statistics must match the ordinary
layout to float tolerance.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.train.losses import dice_loss


def _model():
    return UNet(spatial_dims=3, in_channels=1, out_channels=5,
                channels=(4, 8, 16), strides=(2, 2), num_res_units=2)


def _apply_train(model, variables, x, label):
    def loss_fn(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, training=True, mutable=["batch_stats"],
        )
        return dice_loss(out, label), mut["batch_stats"]

    (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    return loss, bs, grads


def test_phase_top_matches_plain(monkeypatch):
    model = _model()
    shape = (2, 16, 16, 16, 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 5, shape[:-1]).astype(np.int32))

    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "off")
    variables = model.init(jax.random.key(0), x, training=False)
    eval_off = model.apply(variables, x, training=False)
    loss_off, bs_off, g_off = _apply_train(model, variables, x, label)

    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "on")
    # same variables load unchanged: the phase path keeps the param tree
    eval_on = model.apply(variables, x, training=False)
    loss_on, bs_on, g_on = _apply_train(model, variables, x, label)

    np.testing.assert_allclose(
        np.asarray(eval_on), np.asarray(eval_off), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(float(loss_on), float(loss_off), atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        bs_on, bs_off,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-2
        ),
        g_on, g_off,
    )


@pytest.mark.parametrize("norm", ["INSTANCE", "NONE"])
def test_phase_top_other_norms(monkeypatch, norm):
    model = UNet(spatial_dims=3, in_channels=1, out_channels=4,
                 channels=(4, 8), strides=(2,), num_res_units=1, norm=norm)
    shape = (2, 8, 8, 8, 1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "off")
    variables = model.init(jax.random.key(1), x, training=False)
    off = model.apply(variables, x, training=False)
    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "on")
    on = model.apply(variables, x, training=False)
    np.testing.assert_allclose(
        np.asarray(on), np.asarray(off), atol=1e-4, rtol=1e-3
    )


def test_phase_top_2d(monkeypatch):
    model = UNet(spatial_dims=2, in_channels=1, out_channels=3,
                 channels=(4, 8), strides=(2,), num_res_units=1)
    shape = (2, 16, 16, 1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "off")
    variables = model.init(jax.random.key(2), x, training=False)
    off = model.apply(variables, x, training=False)
    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "on")
    on = model.apply(variables, x, training=False)
    np.testing.assert_allclose(
        np.asarray(on), np.asarray(off), atol=1e-4, rtol=1e-3
    )


def test_phase_logits_output_and_loss(monkeypatch):
    """phase_logits output: d2s(phase) == ordinary output, and the
    phase-major Dice equals the full-resolution Dice exactly."""
    from segmantic_tpu.ops import fast_conv
    from segmantic_tpu.train.losses import dice_loss_phase

    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "on")
    model = _model()
    shape = (2, 16, 16, 16, 1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 5, shape[:-1]).astype(np.int32))
    variables = model.init(jax.random.key(3), x, training=False)

    full = model.apply(variables, x, training=False)
    ph = model.apply(variables, x, training=False, phase_logits=True)
    assert ph.shape == (2, 8, 8, 8, 8 * 5)
    np.testing.assert_allclose(
        np.asarray(fast_conv.depth_to_space(ph, 5)), np.asarray(full),
        atol=1e-6,
    )

    l_full = dice_loss(full, label)
    l_ph = dice_loss_phase(ph, fast_conv.space_to_depth(label[..., None]))
    np.testing.assert_allclose(float(l_ph), float(l_full), atol=1e-6)

    # uniform contract when the top stage did NOT phase-run
    monkeypatch.setenv("SEGMANTIC_PHASE_TOP", "off")
    ph_off = model.apply(variables, x, training=False, phase_logits=True)
    np.testing.assert_allclose(
        np.asarray(fast_conv.depth_to_space(ph_off, 5)),
        np.asarray(model.apply(variables, x, training=False)),
        atol=1e-6,
    )


def test_train_step_phase_loss_matches(monkeypatch):
    """The production train step's loss is unchanged by the phase-major
    Dice path (same value, phase on vs off, identical init/batch)."""
    import optax

    from segmantic_tpu.train.trainer import make_train_step

    model = _model()
    patch = (16, 16, 16)
    rng = np.random.default_rng(4)
    img = jnp.asarray(
        rng.standard_normal((2, 24, 24, 24, 1)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, 5, (2, 24, 24, 24)).astype(np.int32))
    key = jax.random.key(0)

    from segmantic_tpu.train.augment import AugmentConfig

    # the gate must actually engage for this config, else both runs take
    # the plain-dice path and the equality below is vacuous
    assert model.phase_top_ok()

    losses = {}
    for tag in ("on", "off"):
        monkeypatch.setenv("SEGMANTIC_PHASE_DICE", tag)
        variables = model.init(
            jax.random.key(7), jnp.zeros((1,) + patch + (1,)), training=False)
        opt = optax.adam(1e-3)
        step = make_train_step(model, opt, AugmentConfig(), patch,
                               mixed_precision=False)
        _, _, _, loss = step(variables["params"],
                             variables.get("batch_stats", {}),
                             opt.init(variables["params"]), img, lbl, key)
        losses[tag] = float(loss)
    np.testing.assert_allclose(losses["on"], losses["off"], atol=1e-5)
