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

def test_conv3d_packed_vjp_matches_xla():
    """fwd/dx/dw of the differentiable packed conv vs XLA autodiff."""
    from segmantic_tpu.ops.pallas_conv import (
        conv3d_packed,
        conv3d_packed_dw,
        packed_vjp_supported,
    )

    assert packed_vjp_supported((8, 48, 48, 48, 16), 16)
    assert packed_vjp_supported((8, 96, 96, 96, 8), 8)
    assert not packed_vjp_supported((8, 12, 12, 12, 64), 64)

    rng = np.random.default_rng(1)
    B, S, CI, CO = 4, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((B, S, S, S, CI)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, CI, CO)) * 0.1).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((B, S, S, S, CO)).astype(np.float32))

    def ref_loss(xx, ww):
        return (conv3d_reference(xx, ww, out_dtype=jnp.float32) * ct).sum()

    def got_loss(xx, ww):
        return (conv3d_packed(xx, ww, True) * ct).sum()

    np.testing.assert_allclose(
        np.asarray(conv3d_packed(x, w, True)),
        np.asarray(conv3d_reference(x, w, out_dtype=jnp.float32)), atol=1e-4)
    rdx, rdw = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gdx, gdw = jax.grad(got_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gdx), np.asarray(rdx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gdw), np.asarray(rdw),
                               rtol=1e-3, atol=2e-2)

    # the dw kernel alone, against an einsum oracle
    dw = conv3d_packed_dw(x, ct, interpret=True)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    want = jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.einsum("bdhwc,bdhwo->co",
                           xp[:, a:a + S, b_:b_ + S, c_:c_ + S, :], ct)
                for c_ in range(3)], 0)
            for b_ in range(3)], 0)
        for a in range(3)], 0)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(want),
                               rtol=1e-4, atol=1e-3)
