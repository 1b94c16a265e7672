"""i2i module: architectures produce correct shapes, pix2pix learns a toy
intensity inversion, cyclegan runs stable steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.i2i.models import PatchDiscriminator, ResnetGenerator
from segmantic_tpu.i2i.train import train_cyclegan, train_pix2pix


def test_generator_shapes_2d():
    gen = ResnetGenerator(out_channels=1, base_features=8, n_blocks=2)
    x = jnp.zeros((2, 32, 32, 1))
    params = gen.init(jax.random.key(0), x)
    y = gen.apply(params, x)
    assert y.shape == (2, 32, 32, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh range


def test_discriminator_patch_output():
    disc = PatchDiscriminator(base_features=8, n_layers=2)
    x = jnp.zeros((2, 32, 32, 2))
    params = disc.init(jax.random.key(0), x)
    y = disc.apply(params, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert y.shape[1] < 32  # patch logits, downsampled


def test_generator_3d():
    gen = ResnetGenerator(out_channels=1, base_features=4, n_blocks=1)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = gen.init(jax.random.key(0), x)
    assert gen.apply(params, x).shape == (1, 16, 16, 16, 1)


def _paired_batches(n, batch=4, size=32, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        src = rng.uniform(-1, 1, (batch, size, size, 1)).astype(np.float32)
        dst = -src  # learn intensity inversion
        yield src, dst


def test_pix2pix_learns_inversion(tmp_path):
    result = train_pix2pix(
        _paired_batches(130),
        steps=120,
        lambda_l1=100.0,
        lr=5e-3,
        base_features=8,
        n_blocks=1,
        output_dir=tmp_path,
        log_every=10,
    )
    assert result.checkpoint is not None and result.checkpoint.exists()
    l1_first = result.history[0]["l1"]
    l1_last = result.history[-1]["l1"]
    assert l1_last < l1_first * 0.65, (l1_first, l1_last)


def test_cyclegan_runs_and_is_finite(tmp_path):
    def batches():
        rng = np.random.default_rng(1)
        while True:
            a = rng.uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
            b = rng.uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
            yield a, b

    result = train_cyclegan(
        batches(),
        steps=5,
        base_features=4,
        n_blocks=1,
        output_dir=tmp_path,
        log_every=2,
    )
    assert result.checkpoint.exists()
    assert all(np.isfinite(r["g_loss"]) for r in result.history)
    assert "gen_ab" in result.generator_params
