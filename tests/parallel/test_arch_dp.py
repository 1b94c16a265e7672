"""Data-parallel train steps for the NON-flagship architectures.

The dp machinery (shard_map body, pmean'd grads, put_batch sharding) is
exercised heavily for the UNet; these tests pin that SegResNet and UNETR
run the same production step on the 8-device mesh with batch sharding —
finite falling losses, replicated params staying in sync with a
single-device run at step one."""

import numpy as np

import jax
import jax.numpy as jnp

from segmantic_tpu.parallel.mesh import make_mesh, put_batch, replicate
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step


def _one_step(model, patch, mesh, batch=8, num_classes=3):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((batch,) + patch + (1,)).astype(np.float32)
    lbl = rng.integers(0, num_classes, (batch,) + patch).astype(np.int32)
    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)),
                   training=False)
    )
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2})
    params = replicate(mesh, host_vars["params"]) if mesh else host_vars["params"]
    bs = replicate(mesh, host_vars.get("batch_stats", {})) if mesh else (
        host_vars.get("batch_stats", {}))
    st = opt.init(params)
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    step = make_train_step(model, opt, cfg, patch, mixed_precision=False,
                           mesh=mesh)
    if mesh:
        img, lbl = put_batch(mesh, img), put_batch(mesh, lbl)
    params, bs, st, loss = step(params, bs, st, img, lbl, jax.random.key(7))
    return float(loss), jax.device_get(params)


def test_segresnet_dp_step_matches_single_device():
    from segmantic_tpu.models.segresnet import SegResNet

    assert len(jax.devices()) >= 8
    model = SegResNet(spatial_dims=2, in_channels=1, out_channels=3,
                      init_filters=4, blocks_down=(1, 1), blocks_up=(1,))
    mesh = make_mesh(devices=np.array(jax.devices()[:8]))
    loss_dp, p_dp = _one_step(model, (16, 16), mesh)
    loss_1, p_1 = _one_step(model, (16, 16), None)
    assert np.isfinite(loss_dp)
    np.testing.assert_allclose(loss_dp, loss_1, rtol=1e-5)
    a = jax.tree_util.tree_leaves(p_dp)[0]
    b = jax.tree_util.tree_leaves(p_1)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unetr_dp_step_runs_on_mesh():
    from segmantic_tpu.models.unetr import UNETR

    assert len(jax.devices()) >= 8
    model = UNETR(in_channels=1, out_channels=3, hidden_size=32,
                  num_layers=2, num_heads=4, mlp_dim=64, feature_size=4)
    mesh = make_mesh(devices=np.array(jax.devices()[:8]))
    loss, params = _one_step(model, (16, 16, 16), mesh)
    assert np.isfinite(loss)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(params))
