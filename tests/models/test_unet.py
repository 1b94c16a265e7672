import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.models.unet import UNet


def test_unet_2d_shapes():
    model = UNet(
        spatial_dims=2,
        in_channels=1,
        out_channels=3,
        channels=(8, 16, 32),
        strides=(2, 2),
        num_res_units=2,
    )
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    y = model.apply(variables, x, training=False)
    assert y.shape == (2, 32, 32, 3)
    assert "batch_stats" in variables


def test_unet_3d_shapes():
    model = UNet(
        spatial_dims=3,
        in_channels=1,
        out_channels=2,
        channels=(4, 8, 16),
        strides=(2, 2),
    )
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    y = model.apply(variables, x, training=False)
    assert y.shape == (1, 16, 16, 16, 2)


def test_unet_odd_sizes():
    # stride-2 down + transposed up must reproduce odd input sizes
    model = UNet(
        spatial_dims=2,
        out_channels=2,
        channels=(4, 8),
        strides=(2,),
        num_res_units=1,
    )
    x = jnp.zeros((1, 33, 18, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    y = model.apply(variables, x, training=False)
    # SAME-padded stride-2 encoders give ceil(n/2); transposed conv doubles
    assert y.shape[1] in (33, 34) and y.shape[2] == 18


def test_unet_train_mode_updates_batch_stats():
    model = UNet(
        spatial_dims=2, out_channels=2, channels=(4, 8), strides=(2,), num_res_units=1
    )
    x = jnp.ones((2, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    y, mutated = model.apply(
        variables, x, training=True, mutable=["batch_stats"]
    )
    assert y.shape == (2, 16, 16, 2)
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.array_equal(a, b) for a, b in zip(leaves_before, leaves_after)
    )


def test_unet_instance_norm_no_batch_stats():
    model = UNet(
        spatial_dims=2,
        out_channels=2,
        channels=(4, 8),
        strides=(2,),
        norm="INSTANCE",
    )
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    assert "batch_stats" not in variables


def test_unet_param_count_reasonable():
    # reference default config: ~4.8M params for 3D (sanity bound only)
    model = UNet(spatial_dims=2, out_channels=3)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 1e5 < n < 1e8
