"""ZeRO-1 optimizer-state sharding correctness.

``train(zero_optimizer=True)`` partitions the Adam moments over the 'data'
mesh axis and updates shardwise (reduce-scatter grads -> sharded update ->
all-gather params). Pins (a) exactness against the replicated update and
(b) that the moments really are partitioned (1/N per device). The reference
has no distributed optimizer (its only parallelism is a Lightning GPU list,
reference: src/segmantic/seg/monai_unet.py:529-538).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.parallel.mesh import (
    make_mesh,
    put_batch,
    replicate,
    shard_opt_state,
    zero_placement,
)
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step


def _run_steps(zero: bool, n_steps=3, optimizer=None):
    mesh = make_mesh(devices=jax.devices()[:8])
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=3, channels=(8, 16),
        strides=(2,), num_res_units=1,
    )
    patch = (16, 16)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((8,) + patch + (1,)).astype(np.float32)
    lbl = rng.integers(0, 3, (8,) + patch).astype(np.int32)

    host_vars = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1,) + patch + (1,)), training=False)
    )
    opt = make_optimizer(optimizer or {"optimizer": "Adam", "lr": 1e-3})
    params = replicate(mesh, host_vars["params"])
    bs = replicate(mesh, host_vars.get("batch_stats", {}))
    st = opt.init(params)
    st = shard_opt_state(mesh, st) if zero else replicate(mesh, st)
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    step = make_train_step(
        model, opt, cfg, patch, mixed_precision=False, mesh=mesh, zero=zero
    )

    img_d = put_batch(mesh, img)
    lbl_d = put_batch(mesh, lbl)
    key = jax.random.key(7)
    losses = []
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        params, bs, st, loss = step(params, bs, st, img_d, lbl_d, sub)
        losses.append(float(loss))
    return losses, jax.device_get(params), st


def test_zero_matches_replicated_update():
    # SGD+momentum: linear in gradients, so only float reduction-order
    # noise remains (the reduce-scatter lowering reduces in a different
    # order than the all-reduce; Adam's g/sqrt(v) amplifies that to ~lr
    # on near-zero-gradient params — same rationale as test_dp_equivalence)
    sgd = {"optimizer": "SGD", "lr": 1e-2, "momentum": 0.9}
    losses_r, params_r, _ = _run_steps(zero=False, optimizer=sgd)
    losses_z, params_z, _ = _run_steps(zero=True, optimizer=sgd)
    np.testing.assert_allclose(losses_r, losses_z, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_r), jax.tree_util.tree_leaves(params_z)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_zero_moments_are_partitioned():
    # Adam: both moments shard; at least one leaf sharded over 'data' with
    # an addressable shard 1/8 the leaf size
    _, _, st_z = _run_steps(zero=True, n_steps=1)
    mesh = make_mesh(devices=jax.devices()[:8])
    n_data = int(mesh.shape["data"])
    sharded_leaves = 0
    for leaf in jax.tree_util.tree_leaves(st_z):
        if not hasattr(leaf, "sharding") or leaf.ndim == 0:
            continue
        spec = getattr(leaf.sharding, "spec", None)
        if spec is not None and "data" in tuple(spec):
            shard = leaf.addressable_shards[0].data
            assert shard.size * n_data == leaf.size
            sharded_leaves += 1
    assert sharded_leaves > 0


def test_zero_placement_picks_divisible_axis():
    mesh = make_mesh(devices=jax.devices()[:8])
    # widest divisible axis shards; indivisible shapes replicate
    s = zero_placement(mesh, jnp.zeros((3, 3, 16, 32)))
    assert tuple(s.spec) == (None, None, None, "data")
    s = zero_placement(mesh, jnp.zeros((5, 7)))
    assert all(p is None for p in tuple(s.spec))
    s = zero_placement(mesh, jnp.zeros(()))
    assert tuple(s.spec) == ()


def test_train_zero_optimizer_end_to_end(tmp_path):
    """The public train() loop with ZeRO-1 enabled: full cache/sampler/
    step/validate/checkpoint path plus the per-epoch LR update on the
    sharded optimizer state."""
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
    from segmantic_tpu.io.nifti import write_volume
    from segmantic_tpu.train.trainer import train

    img_dir, lbl_dir = tmp_path / "image", tmp_path / "label"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0))
    for i in range(3):
        lbl = np.zeros((24, 24), np.int32)
        lbl[6:16, 6:16] = 1
        img = (lbl == 1) * 2.0 + rng.normal(0, 0.2, (24, 24))
        write_volume(
            img_dir / f"c{i}.nii.gz",
            Volume(data=img.astype(np.float32)[None], affine=aff),
        )
        write_volume(
            lbl_dir / f"c{i}.nii.gz",
            Volume(data=lbl.astype(np.uint8)[None], affine=aff.copy()),
        )
    result = train(
        image_dir=img_dir,
        labels_dir=lbl_dir,
        output_dir=tmp_path / "run",
        num_classes=2,
        spatial_dims=2,
        spatial_size=(8, 8),
        channels=(8, 16),
        strides=(2,),
        num_samples=4,
        batch_size=2,
        max_epochs=2,
        mixed_precision=False,
        zero_optimizer=True,
        lr_scheduling={"scheduler": "Cosine", "T_0": 4},
        optimizer={"optimizer": "Adam", "lr": 3e-3},
        val_roi_size=(24, 24),
        seed=0,
    )
    assert result.best_checkpoint is not None
    assert np.isfinite([h["train_loss"] for h in result.history]).all()


def test_zero_rejects_model_parallel(tmp_path):
    from segmantic_tpu.train.trainer import train

    with pytest.raises(ValueError, match="zero_optimizer"):
        train(
            image_dir=tmp_path,
            labels_dir=tmp_path,
            output_dir=tmp_path / "run",
            num_classes=2,
            spatial_dims=2,
            model_parallel=2,
            zero_optimizer=True,
        )


def test_zero_requires_multi_device_mesh():
    model = UNet(
        spatial_dims=2, in_channels=1, out_channels=2, channels=(4, 8),
        strides=(2,), num_res_units=1,
    )
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-3})
    cfg = AugmentConfig(spatial=False, intensity=False)
    with pytest.raises(ValueError):
        make_train_step(
            model, opt, cfg, (16, 16), mixed_precision=False, mesh=None, zero=True
        )
