"""UNETR (3D) in flax — "Transformers for 3D Medical Image Segmentation"
(Hatamizadeh et al., 2021), the MONAI companion architecture to the UNet
the reference wraps. Third architecture family, selected via
``train(arch="unetr")``.

Topology (MONAI ``UNETR`` defaults: hidden 768, 12 layers, 12 heads,
MLP 3072, patch 16, feature_size 16, instance norm):

- a ViT encoder: non-overlapping 16^3 patch embedding (stride-16 conv),
  learnable positional embedding, pre-LayerNorm transformer blocks;
  hidden states are tapped at depths L/4, L/2, 3L/4, L (z3/z6/z9/z12 at
  the default 12 layers);
- CNN skip branches project each tap back onto its spatial grid (1/16
  resolution) and progressively upsample: input -> 2 convs (f);
  z3 -> 3 deconvs (2f @ 1/2); z6 -> 2 deconvs (4f @ 1/4);
  z9 -> 1 deconv (8f @ 1/8);
- a decoder mirrors upward from z12 (1/16): deconv x2, concat the skip,
  two 3^3 convs — four stages to full resolution, then a 1^3 conv head.

TPU-first notes: the ViT body is MXU-dense by construction (token
matmuls; at 96^3 / patch 16 there are only 216 tokens, so plain softmax
attention is a handful of small GEMMs — no flash kernel needed). The
decoder reuses the channel-last conv stack of :mod:`.unet`. The
phase-space decoder machinery does not apply (``phase_top_ok() ->
False``: concat skips + instance norm, like SegResNet).

reference context: the upstream framework wraps a single MONAI UNet
(src/segmantic/seg/monai_unet.py:105-124); this module is a capability
extension beyond the reference, same trainer/checkpoint/predict machinery.

Measured (r4, TPU v5e): 22.3M labeled voxels/s/chip at batch 8 / 96^3
(`SEGMANTIC_BENCH_ARCH=unetr`; MONAI defaults) — the full-resolution
feature_size=16 stages store 8x lane-padded (C=16 on the 128-lane
minor: a 432 MB bf16[16,96^3,16] activation costs 3.38G HBM), which
bounds both batch (8 on 16 GB) and throughput; the UNet's phase-space
rewrites do not transfer to this topology. Quality: **0.9753 best val
Dice @25 epochs** (`exp/train_quality.py --arch unetr`, compact ViT at
32^3) — ahead of the UNet's 0.9691 and SegResNet's 0.7901 on the same
task.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from .unet import Norm, _activation


class TransformerBlock(nn.Module):
    """Pre-LN ViT block: LN -> MHSA -> +res, LN -> MLP(GELU) -> +res."""

    hidden: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):  # (B, T, H)
        dt = x.dtype  # compute dtype follows the input (params stay f32)
        y = nn.LayerNorm(epsilon=1e-6, dtype=dt)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden, dtype=dt
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=dt)(x)
        y = nn.Dense(self.mlp_dim, dtype=dt)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.hidden, dtype=dt)(y)
        return x + y


class ConvBlock(nn.Module):
    """norm -> act after a 3^3 conv, twice (the UNETR basic block)."""

    features: int
    norm: str = "INSTANCE"
    act: str = "RELU"

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis=None):
        nd = x.ndim - 2
        for i in range(2):
            x = nn.Conv(self.features, (3,) * nd, dtype=x.dtype,
                        name=f"conv_{i}")(x)
            x = Norm(kind=self.norm)(x, training, norm_axis)
            x = _activation(self.act)(x)
        return x


class DeconvBlock(nn.Module):
    """Stride-2 kernel-2 transposed conv (exact 2x upsample, no overlap)."""

    features: int

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        return nn.ConvTranspose(
            self.features, (2,) * nd, strides=(2,) * nd, dtype=x.dtype,
            name="deconv",
        )(x)


class UNETR(nn.Module):
    """ViT encoder + progressive-deconv decoder (MONAI UNETR topology)."""

    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    feature_size: int = 16
    patch_size: int = 16
    norm: str = "INSTANCE"
    act: str = "RELU"

    def phase_top_ok(self) -> bool:
        """Phase-major decoder/dice machinery is a UNet feature; the
        trainer consults this duck-typed gate on every architecture."""
        return False

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis=None,
                 phase_logits: bool = False):
        if phase_logits:
            raise ValueError("UNETR has no phase-logits output")
        if self.spatial_dims != 3 or x.ndim != 5:
            raise ValueError("UNETR is 3D: expected (N, D, H, W, C) input")
        if self.patch_size != 16:
            # the 4-stage x2 decoder implies a 16x patch grid (the same
            # fixed constant as MONAI's UNETR)
            raise ValueError("UNETR requires patch_size=16")
        p = self.patch_size
        spatial = x.shape[1:-1]
        if any(s % p for s in spatial):
            raise ValueError(
                f"spatial size {spatial} must be divisible by patch {p}"
            )
        grid = tuple(s // p for s in spatial)
        n_tokens = math.prod(grid)
        f = self.feature_size

        # --- ViT encoder -------------------------------------------------
        z = nn.Conv(
            self.hidden_size, (p,) * 3, strides=(p,) * 3, dtype=x.dtype,
            name="patch_embed",
        )(x)
        z = z.reshape(z.shape[0], n_tokens, self.hidden_size)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_tokens, self.hidden_size),
        )
        z = z + pos.astype(z.dtype)
        taps = {}
        quarter = max(1, self.num_layers // 4)
        for i in range(self.num_layers):
            z = TransformerBlock(
                self.hidden_size, self.num_heads, self.mlp_dim,
                name=f"block_{i}",
            )(z)
            if (i + 1) % quarter == 0:
                taps[(i + 1) // quarter] = z
        z12 = nn.LayerNorm(epsilon=1e-6, dtype=z.dtype,
                           name="encoder_norm")(taps.get(4, z))

        def grid_view(t):  # (B, T, H) -> (B, *grid, H)
            return t.reshape((t.shape[0],) + grid + (self.hidden_size,))

        # --- skip branches ------------------------------------------------
        enc1 = ConvBlock(f, self.norm, self.act, name="encoder1")(
            x, training, norm_axis
        )
        # z3 -> 1/2 (3 deconvs), z6 -> 1/4 (2), z9 -> 1/8 (1)
        def pr_up(t, n_up, feats, name):
            y = grid_view(t)
            for j in range(n_up):
                y = DeconvBlock(feats, name=f"{name}_up_{j}")(y)
                y = ConvBlock(feats, self.norm, self.act,
                              name=f"{name}_conv_{j}")(y, training, norm_axis)
            return y

        enc2 = pr_up(taps.get(1, z), 3, f * 2, "encoder2")
        enc3 = pr_up(taps.get(2, z), 2, f * 4, "encoder3")
        enc4 = pr_up(taps.get(3, z), 1, f * 8, "encoder4")

        # --- decoder -------------------------------------------------------
        y = grid_view(z12)
        for feats, skip, name in (
            (f * 8, enc4, "decoder5"),
            (f * 4, enc3, "decoder4"),
            (f * 2, enc2, "decoder3"),
            (f, enc1, "decoder2"),
        ):
            y = DeconvBlock(feats, name=f"{name}_up")(y)
            y = jnp.concatenate([y, skip], axis=-1)
            y = ConvBlock(feats, self.norm, self.act, name=f"{name}_conv")(
                y, training, norm_axis
            )
        return nn.Conv(self.out_channels, (1,) * 3, dtype=y.dtype,
                       name="out")(y)
