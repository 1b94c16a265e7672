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
decoder reuses the channel-last conv stack of :mod:`.unet`.

LANE PACKING (r5, ``SEGMANTIC_UNETR_PACK=on`` default): the two narrow
spatial regions — full resolution at C=16 (8x lane padding on the
128-wide minor) and half resolution at C=32 (4x) — run entirely in
subpixel PHASE space (:mod:`segmantic_tpu.ops.fast_conv`): 2x2x2 spatial
blocks fold into channels, so every activation in those regions stores
lane-DENSE (e.g. bf16[B,48^3,128] instead of an 8x-padded
bf16[B,96^3,16]). The pieces, all exact and differentiable:

- the kernel-2 stride-2 "deconv" is one pointwise matmul onto the phase
  channels (``subpixel_phase_conv_k2`` — no tap overlap, so no conv at
  all); skip concat is a phase-major channel concat; the 3^3 convs run
  as block-space expanded convs (``phase_conv_s1``); instance norm takes
  its per-(B,C) spatial stats over (spatial, phase) — the identical
  value set; the 1^3 head is a block-diagonal pointwise matmul; ONE
  depth-to-space materializes the logits at the very end.

Same parameter tree either way — checkpoints interchange, and
``tests/models/test_unetr_pack.py`` pins packed == plain for outputs and
gradients. This removed the r4 HBM-capacity wall (batch 8 on 16 GB, the
8x-padded 3.38 GB full-res activations) that held UNETR at 22.3M
voxels/s/chip.

reference context: the upstream framework wraps a single MONAI UNet
(src/segmantic/seg/monai_unet.py:105-124); this module is a capability
extension beyond the reference, same trainer/checkpoint/predict machinery.

Measured (TPU v5e, `exp/unetr_pack_ab.py`, interleaved): packing OFF
22.4M labeled voxels/s/chip at batch 8 / 96^3 (the r4 number) vs ON
40.1M (316.2 -> 176.7 ms/step, **1.79x**), first-step losses
bit-identical. With the phase-dice head (``phase_top_ok``) the HBM
ceiling lifts from the hard b8 wall to b12+ (fresh-process b12 runs at
36.8M — slower per voxel than b8, so b8 remains the throughput point:
packed UNETR is compute-bound, no longer capacity-bound). Quality:
0.9753 best val Dice @25 epochs (`exp/train_quality.py --arch unetr`,
r4) — best of the three architectures; the packed path is exact, so
quality carries over (r5 re-run in BASELINE.md).
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
from flax import linen as nn

from ..ops import fast_conv
from .unet import DispatchConv3D, Norm, _activation


def pack_on() -> bool:
    """Run the narrow-channel spatial regions lane-packed (phase-major)?
    Exact either way; default on (SEGMANTIC_UNETR_PACK=off disables)."""
    return os.environ.get("SEGMANTIC_UNETR_PACK", "on").lower() not in (
        "0", "off", "false",
    )


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
    """norm -> act after a 3^3 conv, twice (the UNETR basic block).

    With ``phase=True`` the input/output are phase-major tensors at half
    resolution: the convs run block-space (``phase_conv_s1``), the norm
    reduces over (spatial, phase) per true channel — exact, same params.
    """

    features: int
    norm: str = "INSTANCE"
    act: str = "RELU"
    phase: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis=None):
        nd = x.ndim - 2
        g = 2**nd if self.phase else 1
        for i in range(2):
            if self.phase:
                x = DispatchConv3D(
                    self.features, (3,) * nd, (1,) * nd, phase=True,
                    name=f"conv_{i}",
                )(x, training)
            else:
                x = nn.Conv(self.features, (3,) * nd, dtype=x.dtype,
                            name=f"conv_{i}")(x)
            x = Norm(kind=self.norm, phase_groups=g)(x, training, norm_axis)
            x = _activation(self.act)(x)
        return x


class _PhaseDeconv(nn.Module):
    """Phase-space twin of the kernel-2 stride-2 ``nn.ConvTranspose``:
    same kernel/bias parameters, output stays the phase-major tensor at
    input resolution (``subpixel_phase_conv_k2``)."""

    features: int

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        kshape = (2,) * nd + (x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = fast_conv.subpixel_phase_conv_k2(x, kernel.astype(x.dtype))
        return y + fast_conv.tile_phase(bias, nd).astype(y.dtype)


class DeconvBlock(nn.Module):
    """Stride-2 kernel-2 transposed conv (exact 2x upsample, no overlap).

    ``phase_out=True`` emits the phase-major tensor at input resolution
    instead of materializing the (lane-padded) 2x volume."""

    features: int
    phase_out: bool = False

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        if self.phase_out:
            return _PhaseDeconv(self.features, name="deconv")(x)
        return nn.ConvTranspose(
            self.features, (2,) * nd, strides=(2,) * nd, dtype=x.dtype,
            name="deconv",
        )(x)


class _PhasePointwise(nn.Module):
    """Phase-space twin of a kernel-1 ``nn.Conv`` head (same params):
    block-diagonal over phases, one shared (Ci -> Co) matmul."""

    features: int

    @nn.compact
    def __call__(self, p):
        nd = p.ndim - 2
        ci = p.shape[-1] // (2**nd)
        kshape = (1,) * nd + (ci, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return fast_conv.phase_pointwise_conv(p, kernel.astype(p.dtype), bias)


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
        """With lane packing on, the head's pre-depth-to-space tensor IS a
        phase-major logits tensor in the UNet convention (lane = ph*C + c,
        ``depth_to_space(out, C)`` == full-res logits), so the trainer's
        matmul-segmented phase Dice applies — skipping the full-resolution
        logits materialization and the f32 softmax-normalizer broadcasts
        that otherwise dominate the step's temp HBM (the b16 packed step
        compiled at 15.96/16 GB with the plain dice)."""
        return self.spatial_dims == 3 and pack_on()

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis=None,
                 phase_logits: bool = False):
        if phase_logits and not pack_on():
            raise ValueError(
                "UNETR emits phase logits only with lane packing on "
                "(SEGMANTIC_UNETR_PACK)"
            )
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
        # spatial % 16 == 0 guarantees the even dims packing needs
        pack = pack_on()

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
        # enc1 (full resolution, C=f): phase-packed when enabled — the
        # whole branch lives at half resolution with 8x denser lanes
        enc1 = ConvBlock(f, self.norm, self.act, phase=pack, name="encoder1")(
            fast_conv.space_to_depth(x) if pack else x, training, norm_axis
        )

        # z3 -> 1/2 (3 deconvs), z6 -> 1/4 (2), z9 -> 1/8 (1); with packing
        # the LAST (half-resolution, C=2f) enc2 step stays phase-major too
        def pr_up(t, n_up, feats, name, phase_last=False):
            y = grid_view(t)
            for j in range(n_up):
                ph = phase_last and j == n_up - 1
                y = DeconvBlock(feats, phase_out=ph, name=f"{name}_up_{j}")(y)
                y = ConvBlock(feats, self.norm, self.act, phase=ph,
                              name=f"{name}_conv_{j}")(y, training, norm_axis)
            return y

        enc2 = pr_up(taps.get(1, z), 3, f * 2, "encoder2", phase_last=pack)
        enc3 = pr_up(taps.get(2, z), 2, f * 4, "encoder3")
        enc4 = pr_up(taps.get(3, z), 1, f * 8, "encoder4")

        # --- decoder -------------------------------------------------------
        y = grid_view(z12)
        for feats, skip, name in (
            (f * 8, enc4, "decoder5"),
            (f * 4, enc3, "decoder4"),
        ):
            y = DeconvBlock(feats, name=f"{name}_up")(y)
            y = jnp.concatenate([y, skip], axis=-1)
            y = ConvBlock(feats, self.norm, self.act, name=f"{name}_conv")(
                y, training, norm_axis
            )

        if pack:
            # decoder3 (1/2 res, C=2f) and decoder2 (full res, C=f) run
            # phase-major end to end; the only full-resolution
            # materialization in the whole model is the final logits d2s
            y = DeconvBlock(f * 2, phase_out=True, name="decoder3_up")(y)
            y = fast_conv.phase_concat(y, enc2)
            y = ConvBlock(f * 2, self.norm, self.act, phase=True,
                          name="decoder3_conv")(y, training, norm_axis)
            y = fast_conv.depth_to_space(y, f * 2)  # (B, *S/2, 2f), one 4x-padded read
            y = DeconvBlock(f, phase_out=True, name="decoder2_up")(y)
            y = fast_conv.phase_concat(y, enc1)
            y = ConvBlock(f, self.norm, self.act, phase=True,
                          name="decoder2_conv")(y, training, norm_axis)
            out = _PhasePointwise(self.out_channels, name="out")(y)
            if phase_logits:  # phase-major head for the trainer's phase dice
                return out
            return fast_conv.depth_to_space(out, self.out_channels)

        for feats, skip, name in (
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
