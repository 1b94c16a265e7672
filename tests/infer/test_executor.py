"""Packed-layout eval executor == flax module.apply (eval mode).

The executor rewrites the eval forward (folded BatchNorm, Pallas packed
conv chains, s2d/subpixel strided stages) and must be numerically
indistinguishable from the module graph it replaces.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmantic_tpu.infer.executor import (
    executor_supported,
    make_eval_forward,
)
from segmantic_tpu.models.unet import UNet


def _random_variables(model, shape, seed=0):
    """Init with non-trivial batch stats so BN folding is actually tested."""
    key = jax.random.key(seed)
    variables = model.init(key, jnp.zeros(shape, jnp.float32), training=False)
    ks, kb = jax.random.split(jax.random.key(seed + 1))
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(kb, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        noise = 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if leaf.ndim == 1:  # bias / scale / mean / var: keep var positive
            out.append(jnp.abs(leaf + noise) + 0.01)
        else:
            out.append(leaf + noise)
    return jax.tree_util.tree_unflatten(treedef, out)


def _reference(model, variables, x, dtype):
    out = model.apply(variables, x.astype(dtype), training=False)
    return np.asarray(out, np.float32)


@pytest.mark.parametrize("num_res_units", [2, 0])
def test_executor_matches_module_f32(num_res_units):
    model = UNet(
        spatial_dims=3, in_channels=1, out_channels=5,
        channels=(4, 8, 16), strides=(2, 2), num_res_units=num_res_units,
    )
    assert executor_supported(model)
    shape = (2, 16, 16, 16, 1)
    variables = _random_variables(model, shape)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(shape).astype(np.float32)
    )
    ref = _reference(model, variables, x, jnp.float32)
    got = np.asarray(make_eval_forward(model, jnp.float32)(variables, x))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_executor_packed_chain_interpret():
    """Force the Pallas packed path (interpret mode on CPU): shapes chosen
    so the stride-1 residual chains meet the packing gates (B*C in
    [64, 256], W % 8 == 0)."""
    model = UNet(
        spatial_dims=3, in_channels=1, out_channels=8,
        channels=(8, 16), strides=(2,), num_res_units=2,
    )
    shape = (8, 16, 16, 16, 1)
    variables = _random_variables(model, shape, seed=7)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal(shape).astype(np.float32)
    )
    ref = _reference(model, variables, x, jnp.float32)
    fwd = make_eval_forward(model, jnp.float32, interpret=True)
    got = np.asarray(fwd(variables, x))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_executor_bf16_close_to_module_bf16():
    model = UNet(
        spatial_dims=3, in_channels=2, out_channels=3,
        channels=(4, 8, 16), strides=(2, 2), num_res_units=1,
    )
    shape = (2, 16, 16, 16, 2)
    variables = _random_variables(model, shape, seed=5)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(shape).astype(np.float32)
    )
    ref = _reference(model, variables, x, jnp.bfloat16)
    got = np.asarray(make_eval_forward(model, jnp.bfloat16)(variables, x))
    # folded-norm rounding differs from flax's bf16 normalize; both are
    # bf16-resolution approximations of the same map
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.1)
    assert float(np.abs(got - ref).mean()) < 0.02


def test_unsupported_config_falls_back():
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=2,
        channels=(4, 8), strides=(2,), num_res_units=1,
    )
    assert not executor_supported(model)
    shape = (2, 16, 16, 1)
    variables = _random_variables(model, shape, seed=2)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(shape).astype(np.float32)
    )
    ref = _reference(model, variables, x, jnp.float32)
    got = np.asarray(make_eval_forward(model, jnp.float32)(variables, x))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_val_forward_uses_executor(monkeypatch):
    """make_val_forward routes through the executor unless disabled."""
    from segmantic_tpu.train.trainer import make_val_forward

    model = UNet(
        spatial_dims=3, in_channels=1, out_channels=2,
        channels=(2, 4), strides=(2,), num_res_units=1,
    )
    shape = (1, 8, 8, 8, 1)
    variables = _random_variables(model, shape, seed=9)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal(shape).astype(np.float32)
    )
    on = np.asarray(make_val_forward(model, jnp.float32)(variables, x))
    monkeypatch.setenv("SEGMANTIC_EVAL_EXECUTOR", "off")
    off = np.asarray(make_val_forward(model, jnp.float32)(variables, x))
    np.testing.assert_allclose(on, off, atol=2e-4, rtol=2e-3)


def test_non_unet_archs_fall_back_to_module_apply():
    """SegResNet / UNETR are not executor-rewritable (documented coverage
    gap, BASELINE.md): executor_supported must say so and make_val_forward
    must still produce a correct plain forward for them."""
    from segmantic_tpu.models.segresnet import SegResNet
    from segmantic_tpu.models.unetr import UNETR
    from segmantic_tpu.train.trainer import make_val_forward

    seg = SegResNet(spatial_dims=2, in_channels=1, out_channels=2,
                    init_filters=4, blocks_down=(1, 1), blocks_up=(1,))
    assert not executor_supported(seg)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 16, 16, 1)).astype(np.float32)
    )
    variables = seg.init(jax.random.key(0), x, training=False)
    vf = make_val_forward(seg, jnp.float32)
    got = np.asarray(vf(variables, x))
    ref = np.asarray(seg.apply(variables, x, training=False))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert got.shape == (1, 16, 16, 2)

    unetr = UNETR(in_channels=1, out_channels=2, hidden_size=32,
                  num_layers=1, num_heads=2, mlp_dim=64, feature_size=4)
    assert not executor_supported(unetr)
