"""Augmentation runs INSIDE the shard_map dp body (r5, advisor item).

The exact-count batch subsets (spatial rotation+zoom, Gibbs, spike) pick
their samples with a batch-axis permutation + gather. Done outside the
shard_map on a dp-sharded batch, XLA must reshard (all-to-all) the full
margin volumes and the chained-vs-cropped work lands unevenly across
shards. r5 moves augmentation into the dp body: each shard augments its
LOCAL batch with a per-shard RNG stream, so every batch-axis op stays
on-shard by construction.

These tests pin (a) the dp step with the FULL augmentation zoo runs and
trains, (b) the compiled sharded step contains no all-to-all collective,
and (c) the per-shard RNG streams differ across shards (no duplicated
augmentation draws between shards).
"""

import numpy as np

import jax
import jax.numpy as jnp

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.parallel.mesh import make_mesh, put_batch, replicate
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step


def _setup(mesh, patch=(16, 16), batch=16, margin=4):
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=3, channels=(4, 8),
        strides=(2,), num_res_units=1,
    )
    margin_shape = tuple(p + 2 * margin for p in patch)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((batch,) + margin_shape + (1,)).astype(np.float32)
    lbl = rng.integers(0, 3, (batch,) + margin_shape).astype(np.int32)
    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)),
                   training=False)
    )
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2, "momentum": 0.9})
    params = replicate(mesh, host_vars["params"])
    bs = replicate(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    cfg = AugmentConfig(spatial=True, intensity=True)  # full zoo, subsets on
    step = make_train_step(model, opt, cfg, patch, mixed_precision=False,
                           mesh=mesh)
    return step, params, bs, st, put_batch(mesh, img), put_batch(mesh, lbl)


def test_dp_step_full_aug_trains():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(devices=np.array(jax.devices()[:8]))
    step, params, bs, st, img_d, lbl_d = _setup(mesh)
    key = jax.random.key(11)
    losses = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, bs, st, loss = step(params, bs, st, img_d, lbl_d, sub)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    # params stayed replicated and finite
    leaf = np.asarray(jax.tree_util.tree_leaves(jax.device_get(params))[0])
    assert np.isfinite(leaf).all()


def test_dp_step_full_aug_has_no_all_to_all():
    """The batch-subset permutation must never induce a cross-shard
    batch-axis collective: only the gradient/loss pmean (all-reduce) and
    BatchNorm stat reductions may appear."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(devices=np.array(jax.devices()[:8]))
    step, params, bs, st, img_d, lbl_d = _setup(mesh)
    compiled = step.lower(
        params, bs, st, img_d, lbl_d, jax.random.key(11)
    ).compile()
    hlo = compiled.as_text()
    assert "all-to-all" not in hlo
    # collective-permute would also mean batch-axis data motion
    assert "collective-permute" not in hlo


def test_dp_shards_draw_distinct_augmentations():
    """Two shards with identical local data must produce different
    augmented batches (per-shard fold_in) — otherwise every shard would
    re-draw the same rotations and the effective augmentation diversity
    collapses by the dp factor. Pinned through the loss: a batch whose
    shards hold IDENTICAL samples still yields a different loss than the
    single-device run on one shard's data with the same key, while the
    plain replicated-math path would make them equal if streams matched."""
    assert len(jax.devices()) >= 8
    from segmantic_tpu.train.trainer import make_train_step as mts

    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=3, channels=(4, 8),
        strides=(2,), num_res_units=1,
    )
    patch, margin = (16, 16), 4
    margin_shape = tuple(p + 2 * margin for p in patch)
    rng = np.random.default_rng(3)
    one = rng.standard_normal((1,) + margin_shape + (1,)).astype(np.float32)
    img = np.repeat(one, 8, axis=0)  # 8 identical samples, one per shard
    lbl_one = rng.integers(0, 3, (1,) + margin_shape).astype(np.int32)
    lbl = np.repeat(lbl_one, 8, axis=0)
    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)),
                   training=False)
    )
    opt = make_optimizer({"optimizer": "SGD", "lr": 0.0})  # no param motion
    cfg = AugmentConfig(spatial=True, intensity=False, flip_prob=0.5,
                        spatial_subset=False)
    mesh = make_mesh(devices=np.array(jax.devices()[:8]))
    params = replicate(mesh, host_vars["params"])
    bs = replicate(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    step = mts(model, opt, cfg, patch, mixed_precision=False, mesh=mesh)
    _, _, _, loss = step(
        params, bs, st, put_batch(mesh, img), put_batch(mesh, lbl),
        jax.random.key(5),
    )
    # identical data + identical streams would give per-shard-equal losses
    # whose mean equals the single-shard loss; distinct streams make the
    # shards' augmented views (and losses) differ. Compare against a
    # 1-device run over ONE copy of the sample with the same key.
    mesh1 = make_mesh(devices=np.array(jax.devices()[:1]))
    params1 = replicate(mesh1, host_vars["params"])
    bs1 = replicate(mesh1, host_vars.get("batch_stats", {}))
    step1 = mts(model, opt, cfg, patch, mixed_precision=False, mesh=None)
    _, _, _, loss1 = step1(
        params1, bs1, opt.init(params1), jnp.asarray(one), jnp.asarray(lbl_one),
        jax.random.key(5),
    )
    assert not np.allclose(float(loss), float(loss1), rtol=1e-6)
