"""Lane-packed (phase-major) UNETR == plain layout, in train AND eval.

The UNETR runs its narrow-channel spatial regions (full-res C=f, half-res
C=2f — the 8x/4x lane-padded activations that capped batch at 8 on 16 GB)
in subpixel phase space when SEGMANTIC_UNETR_PACK is on (the default).
Same parameter tree, same function: outputs and gradients must match the
ordinary layout to float tolerance, for the exact-2x deconv identity
(subpixel_phase_conv_k2), the block-space 3^3 convs, the phase-major
concat, the (spatial, phase)-reduced instance norm, and the pointwise
phase head.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmantic_tpu.models.unetr import UNETR
from segmantic_tpu.ops import fast_conv
from segmantic_tpu.train.losses import dice_loss


def _model():
    # compact ViT (the train_quality configuration) on a 32^3 patch
    return UNETR(in_channels=1, out_channels=3, hidden_size=64,
                 num_layers=4, num_heads=4, mlp_dim=128, feature_size=8)


def _grads(model, variables, x, label):
    def loss_fn(p):
        out = model.apply({"params": p}, x, training=True)
        return dice_loss(out, label)

    return jax.value_and_grad(loss_fn)(variables["params"])


def test_packed_matches_plain(monkeypatch):
    model = _model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 3, (2, 32, 32, 32)).astype(np.int32))

    monkeypatch.setenv("SEGMANTIC_UNETR_PACK", "off")
    variables = model.init(jax.random.key(0), x, training=False)
    eval_off = model.apply(variables, x, training=False)
    loss_off, g_off = _grads(model, variables, x, label)

    monkeypatch.setenv("SEGMANTIC_UNETR_PACK", "on")
    # same variables load unchanged: the packed path keeps the param tree
    eval_on = model.apply(variables, x, training=False)
    loss_on, g_on = _grads(model, variables, x, label)

    np.testing.assert_allclose(
        np.asarray(eval_on), np.asarray(eval_off), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(float(loss_on), float(loss_off), atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2
        ),
        g_on, g_off,
    )


def test_param_tree_identical(monkeypatch):
    model = _model()
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    trees = {}
    for mode in ("off", "on"):
        monkeypatch.setenv("SEGMANTIC_UNETR_PACK", mode)
        v = model.init(jax.random.key(0), x, training=False)
        trees[mode] = jax.tree_util.tree_map(
            lambda a: a.shape, v["params"]
        )
    assert trees["on"] == trees["off"]


def test_subpixel_phase_conv_k2_matches_lax():
    """d2s(subpixel_phase_conv_k2(x, w)) == lax.conv_transpose(k2 s2 SAME)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 4, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 2, 2, 5, 3)).astype(np.float32))
    ref = jax.lax.conv_transpose(
        x, w, strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = fast_conv.depth_to_space(fast_conv.subpixel_phase_conv_k2(x, w), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_phase_concat_matches_full_res():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)).astype(np.float32))
    pa, pb = fast_conv.space_to_depth(a), fast_conv.space_to_depth(b)
    got = fast_conv.depth_to_space(fast_conv.phase_concat(pa, pb), 5)
    ref = jnp.concatenate([a, b], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_phase_pointwise_conv_matches_conv1():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 1, 6, 4)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    p = fast_conv.space_to_depth(x)
    got = fast_conv.depth_to_space(
        fast_conv.phase_pointwise_conv(p, w, bias), 4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_phase_logits_head_matches_full_dice(monkeypatch):
    """Packed UNETR's phase_logits output is the UNet-convention phase
    tensor: d2s(out) == full logits, and the trainer's phase dice on it
    equals the plain dice on the full-resolution logits (this is what
    removes the f32 softmax-broadcast HBM at the full-res head)."""
    from segmantic_tpu.train.losses import dice_loss_phase

    monkeypatch.setenv("SEGMANTIC_UNETR_PACK", "on")
    model = _model()
    assert model.phase_top_ok()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 3, (2, 32, 32, 32)).astype(np.int32))
    variables = model.init(jax.random.key(0), x, training=False)

    full = model.apply(variables, x, training=False)
    phase = model.apply(variables, x, training=False, phase_logits=True)
    np.testing.assert_allclose(
        np.asarray(fast_conv.depth_to_space(phase, 3)), np.asarray(full),
        atol=0,
    )
    lbl_ph = fast_conv.space_to_depth(label[..., None].astype(jnp.uint8))
    np.testing.assert_allclose(
        float(dice_loss_phase(phase, lbl_ph)), float(dice_loss(full, label)),
        atol=1e-6,
    )

    monkeypatch.setenv("SEGMANTIC_UNETR_PACK", "off")
    assert not model.phase_top_ok()
    with pytest.raises(ValueError):
        model.apply(variables, x, training=False, phase_logits=True)
