"""Data-parallel correctness: the jitted train step must compute the SAME
result on a 1-device and an 8-device mesh (gradient all-reduce + sync
batch-norm semantics are compiled by XLA, not hand-written — this pins
them)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.parallel.mesh import make_mesh, put_batch, replicate
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step


def _run_steps(devices, n_steps=3):
    mesh = make_mesh(devices=devices)
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=3, channels=(4, 8), strides=(2,),
        num_res_units=1,
    )
    patch = (16, 16)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((8,) + patch + (1,)).astype(np.float32)
    lbl = rng.integers(0, 3, (8,) + patch).astype(np.int32)

    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)), training=False)
    )
    # SGD: linear in gradients, so only float reduction-order noise
    # remains (Adam's g/sqrt(v) amplifies it to ~lr near zero-gradient params)
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2, "momentum": 0.9})
    params = replicate(mesh, host_vars["params"])
    bs = replicate(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    step = make_train_step(model, opt, cfg, patch, mixed_precision=False)

    losses = []
    img_d = put_batch(mesh, img)
    lbl_d = put_batch(mesh, lbl)
    key = jax.random.key(7)
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, bs, st, loss = step(params, bs, st, img_d, lbl_d, sub)
        losses.append(float(loss))
    return losses, jax.device_get(params)


def test_1dev_vs_8dev_identical():
    devices = jax.devices()
    assert len(devices) >= 8
    losses_1, params_1 = _run_steps(devices[:1])
    losses_8, params_8 = _run_steps(devices[:8])
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_1), jax.tree_util.tree_leaves(params_8)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
