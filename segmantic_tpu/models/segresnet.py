"""SegResNet (2D/3D) in flax — a second segmentation architecture beyond
the reference's MONAI UNet, TPU-first like :mod:`segmantic_tpu.models.unet`.

Topology follows the public MONAI ``SegResNet`` (Myronenko 2018,
"3D MRI brain tumor segmentation using autoencoder regularization"):

- an initial 3^nd convolution to ``init_filters``;
- encoder stages ``i = 0..n-1``: a stride-2 3^nd conv doubles channels
  (for i > 0), then ``blocks_down[i]`` pre-activation residual blocks
  (norm → act → conv3, twice, + identity);
- decoder stages (deep → shallow): a 1^nd conv halves channels, a 2×
  upsample, an ADDITIVE skip from the matching encoder stage (SegResNet
  adds — the UNet concatenates), then ``blocks_up[i]`` residual blocks;
- a final norm → act → 1^nd conv to ``out_channels``.

TPU-first choices shared with the UNet: channel-LAST layout, convs
through :class:`~segmantic_tpu.models.unet.DispatchConv3D` (space-to-depth
stem rewrites where eligible), the 2× upsample as a
:class:`~segmantic_tpu.models.unet.SubpixelConvTranspose` (MONAI's DECONV
upsample mode — trainable, and the stride-2 kernel-3 form lowers to the
subpixel factorization instead of a conv_transpose relayout), GroupNorm
by default (no cross-device batch statistics needed under dp).

reference context: the upstream framework wraps a single architecture
(src/segmantic/seg/monai_unet.py:105-124); this module is a capability
extension, selected via ``train(arch="segresnet")``.

Perf-machinery applicability (measured r4, TPU v5e):
- phase-space decoder stages / phase-major dice do NOT apply
  (``phase_top_ok() -> False``: additive skips keep full-res stages, and
  GroupNorm has no foldable running stats) — the trainer consults the
  duck-typed gate, and `SEGMANTIC_PHASE_GEMM` off vs auto is a measured
  wash on this architecture (bench.py arch knob, both ~147.9M);
- the eval executor (`infer.executor`) gates on the UNet topology and
  falls back to plain ``module.apply`` here (correct, just not rewritten);
- measured: 147.9M labeled voxels/s/chip at batch 128 (the production
  train step via ``SEGMANTIC_BENCH_ARCH=segresnet python bench.py``);
  0.7901 best val Dice @25 epochs (`exp/train_quality.py --arch
  segresnet`; the flagship UNet scores 0.9691 on the same task with the
  same r4 subset-aug config — its 0.9720 elsewhere is the r3 pre-subset
  run, within run noise). The 25-epoch gap is CAPACITY, not a bug
  (r5, measured): default init_filters 8 climbs to 0.8773 @50ep (best
  at epoch 44), and the capacity-matched init_filters 16 run reaches
  0.9244 @25ep — same trainer/evaluator throughout.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from .unet import DispatchConv3D, Norm, SubpixelConvTranspose, _activation


class ResBlock(nn.Module):
    """Pre-activation residual block: (norm → act → conv3) × 2 + identity."""

    features: int
    norm: str = "GROUP"
    act: str = "RELU"

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis=None):
        nd = x.ndim - 2
        y = x
        for i in range(2):
            y = Norm(kind=self.norm)(y, training, norm_axis)
            y = _activation(self.act)(y)
            y = DispatchConv3D(
                self.features, (3,) * nd, (1,) * nd, name=f"conv_{i}"
            )(y, training)
        return x + y


class SegResNet(nn.Module):
    """Residual encoder-decoder with additive skips (MONAI SegResNet)."""

    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    init_filters: int = 8
    blocks_down: Sequence[int] = (1, 2, 2, 4)
    blocks_up: Sequence[int] = (1, 1, 1)
    norm: str = "GROUP"
    act: str = "RELU"
    dropout: float = 0.0

    def phase_top_ok(self) -> bool:
        """The phase-major Dice path is a UNet decoder feature; the trainer
        consults this duck-typed gate on every architecture."""
        return False

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis=None,
                 phase_logits: bool = False):
        if phase_logits:
            raise ValueError("SegResNet has no phase-logits output")
        if x.ndim != self.spatial_dims + 2:
            raise ValueError(
                f"expected (N, *spatial[{self.spatial_dims}], C) input, "
                f"got {x.shape}"
            )
        if len(self.blocks_up) != len(self.blocks_down) - 1:
            raise ValueError("len(blocks_up) must be len(blocks_down) - 1")
        nd = self.spatial_dims
        f = self.init_filters

        y = DispatchConv3D(f, (3,) * nd, (1,) * nd, name="conv_init")(
            x, training
        )
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)

        # encoder
        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            feats = f * 2**i
            if i > 0:
                y = DispatchConv3D(
                    feats, (3,) * nd, (2,) * nd, name=f"down_{i}"
                )(y, training)
            for b in range(n_blocks):
                y = ResBlock(
                    feats, norm=self.norm, act=self.act,
                    name=f"enc_{i}_{b}",
                )(y, training, norm_axis)
            skips.append(y)

        # decoder: halve channels (1^nd conv), upsample 2x, ADD the skip
        for j, n_blocks in enumerate(self.blocks_up):
            i = len(self.blocks_down) - 1 - j  # stage being left
            feats = f * 2 ** (i - 1)
            y = DispatchConv3D(
                feats, (1,) * nd, (1,) * nd, name=f"up_conv_{j}"
            )(y, training)
            y = SubpixelConvTranspose(
                feats, (3,) * nd, (2,) * nd, name=f"up_{j}"
            )(y)
            y = y + skips[i - 1]
            for b in range(n_blocks):
                y = ResBlock(
                    feats, norm=self.norm, act=self.act,
                    name=f"dec_{j}_{b}",
                )(y, training, norm_axis)

        y = Norm(kind=self.norm)(y, training, norm_axis)
        y = _activation(self.act)(y)
        return DispatchConv3D(
            self.out_channels, (1,) * nd, (1,) * nd, name="conv_final"
        )(y, training)
