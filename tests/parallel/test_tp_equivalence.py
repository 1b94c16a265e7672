"""Tensor-parallel correctness: a (data=4, model=2) mesh with wide conv
kernels sharded over 'model' (shard_params) must produce the same training
trajectory as pure data-parallel replication — XLA compiles the implied
collectives (SURVEY.md §2.9)."""

import numpy as np

import jax
import jax.numpy as jnp

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.parallel.mesh import (
    make_mesh,
    put_batch,
    replicate,
    shard_params,
)
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step


def _run(tp: bool, n_steps: int = 3):
    mesh = make_mesh(data=4, model=2) if tp else make_mesh()
    # wide enough channels that shard_params actually shards (>= 64)
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=3,
        channels=(64, 128), strides=(2,), num_res_units=1,
    )
    patch = (16, 16)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((8,) + patch + (1,)).astype(np.float32)
    lbl = rng.integers(0, 3, (8,) + patch).astype(np.int32)

    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)),
                   training=False)
    )
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2, "momentum": 0.9})
    place = shard_params if tp else replicate
    params = place(mesh, host_vars["params"])
    bs = place(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    step = make_train_step(model, opt, cfg, patch, mixed_precision=False)

    losses = []
    img_d = put_batch(mesh, img)
    lbl_d = put_batch(mesh, lbl)
    key = jax.random.key(7)
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        params, bs, st, loss = step(params, bs, st, img_d, lbl_d, sub)
        losses.append(float(loss))
    return losses, jax.device_get(params)


def test_sharded_params_actually_shard():
    mesh = make_mesh(data=4, model=2)
    params = {
        "wide": jnp.zeros((3, 3, 64, 128)),
        "narrow": jnp.zeros((3, 3, 1, 8)),
        "vec": jnp.zeros((128,)),
    }
    placed = shard_params(mesh, params)
    assert "model" in str(placed["wide"].sharding.spec)
    assert "model" in str(placed["vec"].sharding.spec)
    assert "model" not in str(placed["narrow"].sharding.spec)


def test_tp_matches_dp_trajectory():
    losses_dp, params_dp = _run(tp=False)
    losses_tp, params_tp = _run(tp=True)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-4)
    flat_dp = jax.tree_util.tree_leaves(params_dp)
    flat_tp = jax.tree_util.tree_leaves(params_tp)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
