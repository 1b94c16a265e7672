"""Batch-packed Pallas conv: correctness vs the XLA reference.

Runs the kernel in pallas interpret mode on the CPU test mesh; on real TPU
hardware the same code compiles via Mosaic (exercised by exp/mfu_probe.py
and the opt-in DispatchConv3D path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.ops.pallas_conv import (
    conv3d_pallas,
    conv3d_reference,
    supported,
)


def test_supported_conditions():
    assert supported((8, 48, 48, 48, 16), 16)
    assert supported((8, 96, 96, 96, 8), 8)
    assert not supported((8, 12, 12, 12, 64), 64)  # W % 8 != 0
    assert not supported((1, 48, 48, 48, 16), 16)  # BC too small
    assert not supported((8, 48, 48, 48, 16), 16, kernel=(1, 1, 1))
    assert not supported((8, 48, 48, 48, 16), 16, strides=(2, 2, 2))


@pytest.mark.parametrize("relu_mode", ["none", "prelu"])
def test_conv3d_pallas_matches_reference(relu_mode):
    rng = np.random.default_rng(0)
    B, S, CI, CO = 4, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((B, S, S, S, CI)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, CI, CO)) * 0.1).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(CO).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 2.0, CO).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(CO).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)

    got = conv3d_pallas(
        x, w, bias=bias, scale=scale, shift=shift, alpha=alpha,
        relu_mode=relu_mode, out_dtype=jnp.float32, interpret=True,
    )
    want = conv3d_reference(
        x, w, bias=bias, scale=scale, shift=shift, alpha=alpha,
        relu_mode=relu_mode, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dispatch_conv_param_tree_matches_nn_conv():
    """DispatchConv3D must keep the exact nn.Conv param tree (checkpoints)."""
    from flax import linen as nn

    from segmantic_tpu.models.unet import DispatchConv3D

    x = jnp.zeros((1, 8, 8, 8, 3), jnp.float32)
    ours = DispatchConv3D(4, (3, 3, 3), (1, 1, 1)).init(jax.random.key(0), x)
    ref = nn.Conv(4, (3, 3, 3), strides=(1, 1, 1), padding="SAME").init(
        jax.random.key(0), x
    )
    ours_shapes = jax.tree_util.tree_map(lambda a: a.shape, ours)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    assert ours_shapes == ref_shapes
