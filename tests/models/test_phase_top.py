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
