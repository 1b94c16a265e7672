"""Image-to-image translation models (pix2pix / CycleGAN) in flax.

The reference documents a pix2pix/CycleGAN T1→T2 style-transfer module that
was removed upstream (reference: docs/index.md:10,40-48; SURVEY.md §2.8) —
rebuilt here TPU-first: channel-last, rank-generic 2D/3D, instance-norm
ResNet generator and PatchGAN discriminator (the standard pix2pix/CycleGAN
architectures), bf16-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * scale + bias


class ResnetBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        y = nn.Conv(self.features, (3,) * nd, padding="SAME", dtype=x.dtype)(x)
        y = InstanceNorm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3,) * nd, padding="SAME", dtype=x.dtype)(y)
        y = InstanceNorm()(y)
        return x + y


class ResnetGenerator(nn.Module):
    """c7s1-64, d128, d256, R256 x n_blocks, u128, u64, c7s1-out + tanh."""

    out_channels: int = 1
    base_features: int = 64
    n_blocks: int = 6

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        f = self.base_features
        y = nn.Conv(f, (7,) * nd, padding="SAME", dtype=x.dtype)(x)
        y = nn.relu(InstanceNorm()(y))
        # downsample x2
        for mult in (2, 4):
            y = nn.Conv(f * mult, (3,) * nd, strides=(2,) * nd, padding="SAME",
                        dtype=x.dtype)(y)
            y = nn.relu(InstanceNorm()(y))
        for _ in range(self.n_blocks):
            y = ResnetBlock(f * 4)(y)
        for mult in (2, 1):
            y = nn.ConvTranspose(f * mult, (3,) * nd, strides=(2,) * nd,
                                 padding="SAME", dtype=x.dtype)(y)
            y = nn.relu(InstanceNorm()(y))
        y = nn.Conv(self.out_channels, (7,) * nd, padding="SAME", dtype=x.dtype)(y)
        return nn.tanh(y)


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN: C64-C128-C256-C512 → 1-channel patch logits."""

    base_features: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        f = self.base_features
        y = nn.Conv(f, (4,) * nd, strides=(2,) * nd, padding="SAME", dtype=x.dtype)(x)
        y = nn.leaky_relu(y, 0.2)
        for i in range(1, self.n_layers):
            y = nn.Conv(f * 2**i, (4,) * nd, strides=(2,) * nd, padding="SAME",
                        dtype=x.dtype)(y)
            y = nn.leaky_relu(InstanceNorm()(y), 0.2)
        y = nn.Conv(f * 2**self.n_layers, (4,) * nd, padding="SAME", dtype=x.dtype)(y)
        y = nn.leaky_relu(InstanceNorm()(y), 0.2)
        return nn.Conv(1, (4,) * nd, padding="SAME", dtype=x.dtype)(y)
