"""shard_map data-parallel train step: equivalence with the single-device
step, and Pallas packed-conv routing on per-shard (local) shapes.

The shard_map path exists so the batch-packed Pallas convs can run on
multi-device meshes (a pallas_call inside a GSPMD jit cannot be
partitioned); its numerics must match the plain jit step: per-shard grads
pmean'd over 'data', BatchNorm statistics reduced via axis_name."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.ops import pallas_conv
from segmantic_tpu.parallel.mesh import make_mesh, put_batch, replicate
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step


def _run_steps(devices, mesh_arg, n_steps=2, batch=8, channels=(4, 8)):
    mesh = make_mesh(devices=devices)
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=3, channels=channels,
        strides=(2,), num_res_units=1,
    )
    patch = (16, 16)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((batch,) + patch + (1,)).astype(np.float32)
    lbl = rng.integers(0, 3, (batch,) + patch).astype(np.int32)

    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)), training=False)
    )
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2, "momentum": 0.9})
    params = replicate(mesh, host_vars["params"])
    bs = replicate(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    step = make_train_step(
        model, opt, cfg, patch, mixed_precision=False,
        mesh=mesh if mesh_arg else None,
    )

    losses = []
    img_d = put_batch(mesh, img)
    lbl_d = put_batch(mesh, lbl)
    key = jax.random.key(7)
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        params, bs, st, loss = step(params, bs, st, img_d, lbl_d, sub)
        losses.append(float(loss))
    return losses, jax.device_get(params), jax.device_get(bs)


def test_shardmap_step_matches_single_device():
    devices = jax.devices()
    assert len(devices) >= 8
    losses_1, params_1, bs_1 = _run_steps(devices[:1], mesh_arg=False)
    losses_8, params_8, bs_8 = _run_steps(devices[:8], mesh_arg=True)
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_1),
                    jax.tree_util.tree_leaves(bs_8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_shardmap_routes_packed_conv_on_local_shapes():
    """3D model sized so the per-shard batch hits the packed-conv gate
    (local B*C = 2*32 = 64); the kernels run in interpret mode off-TPU.
    Pins that routing decisions see LOCAL shapes under shard_map and that
    the packed custom-VJP step matches the XLA step numerically."""
    devices = jax.devices()
    assert len(devices) >= 8

    model = UNet(
        spatial_dims=3, in_channels=1, out_channels=2, channels=(32, 64),
        strides=(2,), num_res_units=2,
    )
    patch = (16, 16, 16)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16,) + patch + (1,)).astype(np.float32)
    lbl = rng.integers(0, 2, (16,) + patch).astype(np.int32)

    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)), training=False)
    )
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2})
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)

    # the second res-subunit conv (32->32 stride 1 @8^3, local B=2) is the
    # eligible stage; sanity-check the gate arithmetic first
    assert pallas_conv.packed_route_supported((2, 8, 8, 8, 32), 32)

    routed = {"n": 0}
    real = pallas_conv.conv3d_packed

    def counting(x, w, interpret=False):
        routed["n"] += 1
        return real(x, w, interpret)

    mesh = make_mesh(devices=devices[:8])
    params = replicate(mesh, host_vars["params"])
    bs = replicate(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    pallas_conv.conv3d_packed = counting
    try:
        step = make_train_step(model, opt, cfg, patch, mixed_precision=False,
                               mesh=mesh)
        params, bs, st, loss = step(
            params, bs, st, put_batch(mesh, img), put_batch(mesh, lbl),
            jax.random.key(3),
        )
        loss_packed = float(loss)
    finally:
        pallas_conv.conv3d_packed = real
    assert routed["n"] > 0, "packed conv was not routed under shard_map"

    # reference: single-device XLA step from the same init
    mesh1 = make_mesh(devices=devices[:1])
    params_1 = replicate(mesh1, host_vars["params"])
    bs_1 = replicate(mesh1, host_vars.get("batch_stats", {}))
    st_1 = opt.init(params_1)
    with pallas_conv.packed_routing(False):
        step_1 = make_train_step(model, opt, cfg, patch, mixed_precision=False)
        _, _, _, loss_1 = step_1(
            params_1, bs_1, st_1, put_batch(mesh1, img), put_batch(mesh1, lbl),
            jax.random.key(3),
        )
    np.testing.assert_allclose(loss_packed, float(loss_1), rtol=1e-4)
