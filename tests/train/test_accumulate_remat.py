"""Gradient accumulation (optax.MultiSteps) and forward rematerialization
(jax.checkpoint) knobs — both must be EXACT: remat recomputes the same ops,
and averaging k identical micro-batch gradients equals the plain gradient.
TPU-native extras beyond the reference's trainer
(reference: src/segmantic/seg/monai_unet.py:339-348).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from segmantic_tpu.models.unet import UNet
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer, set_learning_rate
from segmantic_tpu.train.trainer import make_train_step


@pytest.fixture(scope="module")
def setup():
    model = UNet(
        spatial_dims=3, in_channels=1, out_channels=3,
        channels=(4, 8), strides=(2,), num_res_units=1,
    )
    patch = (8, 8, 8)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + patch + (1,), jnp.float32),
        training=False,
    )
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((2,) + patch + (1,)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 3, (2,) + patch), jnp.int32)
    return model, patch, variables, image, label


def _flat(tree):
    return jnp.concatenate([x.ravel().astype(jnp.float32)
                            for x in jax.tree_util.tree_leaves(tree)])


def test_remat_step_matches_plain(setup):
    model, patch, variables, image, label = setup
    aug = AugmentConfig(spatial=False, intensity=False)
    opt = make_optimizer({"optimizer": "SGD", "lr": 1e-2})
    key = jax.random.key(1)

    results = []
    for remat in (False, True):
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        bs = jax.tree_util.tree_map(jnp.array, variables.get("batch_stats", {}))
        step = make_train_step(model, opt, aug, patch,
                               mixed_precision=False, remat=remat)
        p, b, o, loss = step(params, bs, opt.init(params), image, label, key)
        results.append((_flat(p), float(loss)))

    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(results[0][0]), np.asarray(results[1][0]), rtol=1e-5, atol=1e-7
    )


def test_accumulate_two_identical_microbatches_equals_one_step(setup):
    model, patch, variables, image, label = setup
    aug = AugmentConfig(spatial=False, intensity=False)
    key = jax.random.key(2)

    # plain: one step
    opt1 = make_optimizer({"optimizer": "SGD", "lr": 1e-2})
    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    bs = jax.tree_util.tree_map(jnp.array, variables.get("batch_stats", {}))
    step1 = make_train_step(model, opt1, aug, patch, mixed_precision=False)
    p1, _, _, _ = step1(params, bs, opt1.init(params), image, label, key)

    # accumulated: two micro-steps on the SAME batch (mean of equal grads)
    opt2 = optax.MultiSteps(
        make_optimizer({"optimizer": "SGD", "lr": 1e-2}), every_k_schedule=2
    )
    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    bs = jax.tree_util.tree_map(jnp.array, variables.get("batch_stats", {}))
    step2 = make_train_step(model, opt2, aug, patch, mixed_precision=False)
    o2 = opt2.init(params)
    p2, b2, o2, _ = step2(params, bs, o2, image, label, key)
    # after the first micro-step params must be UNCHANGED
    np.testing.assert_array_equal(
        np.asarray(_flat(p2)), np.asarray(_flat(variables["params"]))
    )
    p2, b2, o2, _ = step2(p2, b2, o2, image, label, key)

    np.testing.assert_allclose(
        np.asarray(_flat(p1)), np.asarray(_flat(p2)), rtol=1e-6, atol=1e-8
    )


def test_set_learning_rate_through_multisteps(setup):
    model, patch, variables, image, label = setup
    opt = optax.MultiSteps(
        make_optimizer({"optimizer": "Adam", "lr": 1e-3}), every_k_schedule=2
    )
    state = opt.init(variables["params"])
    state = set_learning_rate(state, 5e-4)
    np.testing.assert_allclose(
        float(state.inner_opt_state.hyperparams["learning_rate"]), 5e-4, rtol=1e-6
    )
