"""Residual 2D/3D UNet in flax — MONAI-UNet-equivalent topology, TPU-first.

Architecture parity with the UNet the reference wraps
(reference: src/segmantic/seg/monai_unet.py:105-124): per-level stride-2
conv encoder, transposed-conv decoder with skip concatenation, residual
units (``num_res_units`` sub-convolutions + projection shortcut), norm +
PReLU activation, rank-generic (2D/3D) convolutions, configurable
``channels``/``strides``/``dropout``/``act``.

TPU-first choices: channel-LAST layout (N, *spatial, C) so XLA maps convs
straight onto the MXU; bf16-friendly (params live in f32, compute dtype is
configurable); no data-dependent control flow — the whole forward is one
traced graph.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fast_conv, pallas_conv


def phase_stage_ok(nd: int, out_feats: int, strides: int, *,
                   num_res_units: int, dropout: float, kernel_size: int,
                   up_kernel_size: int) -> bool:
    """Run a decoder (convT + residual-unit) stage in subpixel phase
    space? Gated to the measured win region (narrow stages, where the
    full-resolution tiny-C convs are lowering-bound) and exactness
    conditions. SEGMANTIC_PHASE_TOP=off disables; SEGMANTIC_PHASE_MAX
    widens/narrows the phase-channel bound (default 128 = head + next
    stage; swept in exp/phase_train_ab.py). The single source of truth
    for this gate — the flax graph and the eval executor both consult it.
    """
    import os

    if os.environ.get("SEGMANTIC_PHASE_TOP", "on").lower() in (
        "0", "off", "false",
    ):
        return False
    max_ph = int(os.environ.get("SEGMANTIC_PHASE_MAX", "128"))
    return (
        num_res_units > 0
        and dropout == 0.0  # dropout masks would decorrelate
        and strides == 2
        and kernel_size == 3
        and up_kernel_size == 3
        and nd in (2, 3)
        and (2**nd) * out_feats <= max_ph
    )


class DispatchConv3D(nn.Module):
    """Drop-in for ``nn.Conv`` (same param tree: kernel/bias, same init)
    that can route eligible stride-1 3^3 inference forwards through the
    batch-packed Pallas conv kernel (:mod:`segmantic_tpu.ops.pallas_conv`).

    Default OFF: the kernel beats the XLA conv 1.3-1.7x in isolation, but
    per-op swapping loses in-model — XLA fuses the conv with its
    norm/activation neighbors and keeps its own layouts, while each custom
    call forces pack/pad/unpack boundaries. Measured on v5e: full eval fwd
    29.8 ms pure-XLA vs 45 ms with per-op dispatch. The win requires the
    packed layout to PERSIST across a whole inference graph (planned
    follow-up); until then this stays an opt-in experiment."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_pallas: bool = False
    phase: bool = False  # input/output are subpixel phase tensors

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.phase:
            # phase-major input (B, *S, 2^nd * C): same kernel/bias params
            # as the full-resolution conv, applied block-space (exact —
            # ops/fast_conv.py identities); features stays the TRUE count
            nd = x.ndim - 2
            c_true = x.shape[-1] // (2**nd)
            kshape = tuple(self.kernel_size) + (c_true, self.features)
            kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = fast_conv.phase_conv_s1(x, kernel.astype(x.dtype))
            return y + fast_conv.tile_phase(bias, nd).astype(y.dtype)
        c_in = x.shape[-1]
        kshape = tuple(self.kernel_size) + (c_in, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if pallas_conv.packed_route_active() and pallas_conv.packed_route_supported(
            x.shape, self.features, tuple(self.kernel_size), tuple(self.strides)
        ):
            # batch-packed Pallas conv with custom VJP: 1.4-1.5x measured
            # on the tiny-C stride-1 stages (train and eval)
            y = pallas_conv.conv3d_packed(
                x, kernel.astype(x.dtype), jax.default_backend() != "tpu"
            )
            return y + bias.astype(y.dtype)
        if (
            self.use_pallas
            and not training
            and jax.default_backend() == "tpu"
            and pallas_conv.supported(
                x.shape, self.features, tuple(self.kernel_size),
                tuple(self.strides),
            )
        ):
            return pallas_conv.conv3d_pallas(
                x, kernel.astype(x.dtype), bias=bias, out_dtype=x.dtype
            )
        if fast_conv.s2d_eligible(x.shape, self.kernel_size, self.strides):
            # tiny-C stride-2 stem: space-to-depth rewrite, 1.61x on v5e
            return fast_conv.s2d_conv(x, kernel.astype(x.dtype), bias)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=tuple(self.strides),
            padding="SAME",
            dimension_numbers=nn.linear._conv_dimension_numbers(x.shape),
        )
        return y + bias.astype(y.dtype)


class SubpixelConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose`` (same kernel/bias param tree) that
    routes the narrow segmentation head (phase-expanded channels <= 64)
    through the subpixel factorization (:mod:`segmantic_tpu.ops.fast_conv`)
    — stride-2 kernel-3 SAME only; everything else falls back to
    ``lax.conv_transpose`` with identical semantics."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    phase_out: bool = False  # emit the phase tensor (no depth-to-space)

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kshape = tuple(self.kernel_size) + (c_in, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.phase_out:
            # caller guarantees subpixel eligibility; the 2x-upsampled
            # volume stays phase-major at input resolution
            nd = x.ndim - 2
            y = fast_conv.subpixel_phase_conv(x, kernel.astype(x.dtype))
            return y + fast_conv.tile_phase(bias, nd).astype(y.dtype)
        if fast_conv.subpixel_eligible(
            x.shape, self.features, self.kernel_size, self.strides
        ):
            return fast_conv.subpixel_conv_transpose(
                x, kernel.astype(x.dtype), bias
            )
        nd = x.ndim - 2
        sp = "DHW"[-nd:]
        y = jax.lax.conv_transpose(
            x,
            kernel.astype(x.dtype),
            strides=tuple(self.strides),
            padding="SAME",
            dimension_numbers=("N" + sp + "C", sp + "IO", "N" + sp + "C"),
        )
        return y + bias.astype(y.dtype)


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch default
    ``num_parameters=1, init=0.25`` — what MONAI's PRELU resolves to)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.full((1,), self.init, jnp.float32))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def _activation(name: str) -> Callable:
    name = name.upper()
    if name == "PRELU":
        return PReLU()
    if name == "RELU":
        return nn.relu
    if name == "LEAKYRELU":
        return lambda x: nn.leaky_relu(x, 0.01)
    if name == "GELU":
        return nn.gelu
    if name == "TANH":
        return nn.tanh
    raise ValueError(f"unsupported activation {name!r}")


class Norm(nn.Module):
    """BATCH / INSTANCE / GROUP normalization over channel-last inputs.

    ``norm_axis`` names a mapped mesh axis (shard_map/pmap) so BATCH
    statistics reduce over the global batch when the train step runs
    per-shard — the cross-device analog of the reference's full-batch
    BatchNorm under its single-process trainer."""

    kind: str = "BATCH"
    momentum: float = 0.9  # = 1 - torch momentum 0.1
    phase_groups: int = 1  # input is phase-major with this many phases

    @nn.compact
    def __call__(self, x, training: bool, norm_axis: str | None = None):
        kind = self.kind.upper()
        g = self.phase_groups
        if g > 1:
            # phase-major (…, g*C): statistics are per TRUE channel, so
            # expose phases as an extra reduced axis — the param/stat tree
            # stays (C,), numerics match the full-resolution layout exactly
            # (the reduced set of values is identical)
            x = x.reshape(x.shape[:-1] + (g, x.shape[-1] // g))
        if kind == "BATCH":
            y = nn.BatchNorm(
                use_running_average=not training,
                momentum=self.momentum,
                epsilon=1e-5,
                dtype=x.dtype,
                axis_name=norm_axis if training else None,
            )(x)
        elif kind == "INSTANCE":
            y = nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5, dtype=x.dtype)(x)
        elif kind == "GROUP":
            groups = min(8, x.shape[-1])
            y = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=x.dtype)(x)
        elif kind == "NONE":
            y = x
        else:
            raise ValueError(f"unsupported norm {self.kind!r}")
        if g > 1:
            y = y.reshape(y.shape[:-2] + (g * y.shape[-1],))
        return y


class ConvUnit(nn.Module):
    """conv (optionally strided / transposed) → norm → dropout → act."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    transposed: bool = False
    conv_only: bool = False
    norm: str = "BATCH"
    act: str = "PRELU"
    dropout: float = 0.0
    # phase-space stage (ops/fast_conv.py): 'in' consumes a phase tensor,
    # 'out' emits one, 'both' does both; '' is the ordinary layout
    phase: str = ""

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis: str | None = None):
        nd = x.ndim - 2
        kshape = (self.kernel_size,) * nd
        sshape = (self.strides,) * nd
        phase_out = self.phase in ("out", "both")
        if self.transposed:
            x = SubpixelConvTranspose(
                self.features, kshape, sshape, phase_out=phase_out,
                name="ConvTranspose_0",
            )(x)
        else:
            # named Conv_0 to keep the param tree identical to nn.Conv
            x = DispatchConv3D(
                self.features, kshape, sshape,
                phase=self.phase in ("in", "both"), name="Conv_0"
            )(x, training)
        if self.conv_only:
            return x
        # any phase mode leaves the conv output phase-major
        groups = 2**nd if self.phase else 1
        x = Norm(kind=self.norm, phase_groups=groups)(x, training, norm_axis)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not training)(x)
        return _activation(self.act)(x)


class ResidualUnit(nn.Module):
    """``subunits`` conv units with a (projected) residual shortcut.

    First subunit carries the stride; the shortcut is a kernel-size
    (or 1x1 when unstrided) projection whenever shape/channels change.
    """

    features: int
    strides: int = 1
    kernel_size: int = 3
    subunits: int = 2
    last_conv_only: bool = False
    norm: str = "BATCH"
    act: str = "PRELU"
    dropout: float = 0.0
    phase: bool = False  # phase tensor in/out (stride 1, identity shortcut)

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis: str | None = None):
        nd = x.ndim - 2
        residual = x
        y = x
        subunits = max(1, self.subunits)
        for i in range(subunits):
            y = ConvUnit(
                self.features,
                kernel_size=self.kernel_size,
                strides=self.strides if i == 0 else 1,
                conv_only=self.last_conv_only and i == subunits - 1,
                norm=self.norm,
                act=self.act,
                dropout=self.dropout,
                phase="both" if self.phase else "",
            )(y, training, norm_axis)
        if self.phase:
            # caller guarantees stride 1 + matching channels: the shortcut
            # is the identity, exact in phase space
            return y + residual
        if self.strides != 1 or x.shape[-1] != self.features:
            rk = self.kernel_size if self.strides != 1 else 1
            residual = DispatchConv3D(
                self.features,
                (rk,) * nd,
                (self.strides,) * nd,
                name="Conv_0",
            )(residual, training)
        return y + residual


class UNet(nn.Module):
    """Parametric residual UNet (2D/3D) with skip-concatenation.

    Matches the reference defaults: ``channels=(16,32,64,128,256)``,
    ``strides=(2,2,2,2)``, ``num_res_units=2``, batch norm, PReLU
    (reference: src/segmantic/seg/monai_unet.py:114-124). Input/output are
    channel-last: (N, *spatial, C).
    """

    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2
    norm: str = "BATCH"
    act: str = "PRELU"
    dropout: float = 0.0
    kernel_size: int = 3
    up_kernel_size: int = 3

    def _down(self, features: int, strides: int, is_top: bool):
        if self.num_res_units > 0:
            return ResidualUnit(
                features,
                strides=strides,
                kernel_size=self.kernel_size,
                subunits=self.num_res_units,
                norm=self.norm,
                act=self.act,
                dropout=self.dropout,
            )
        return ConvUnit(
            features,
            kernel_size=self.kernel_size,
            strides=strides,
            norm=self.norm,
            act=self.act,
            dropout=self.dropout,
        )

    def _phase_stage_ok(self, x_shape, out_feats: int, strides: int) -> bool:
        return phase_stage_ok(
            len(x_shape) - 2, out_feats, strides,
            num_res_units=self.num_res_units, dropout=self.dropout,
            kernel_size=self.kernel_size, up_kernel_size=self.up_kernel_size,
        )

    def phase_top_ok(self) -> bool:
        """Will the TOP decoder stage run in subpixel phase space? (Shape-
        independent — decidable from the static config; the trainer's
        phase-major Dice path consults this.)"""
        return phase_stage_ok(
            self.spatial_dims, self.out_channels,
            self.strides[0] if self.strides else 1,
            num_res_units=self.num_res_units, dropout=self.dropout,
            kernel_size=self.kernel_size, up_kernel_size=self.up_kernel_size,
        )

    def _up(self, features: int, strides: int, is_top: bool):
        units = [
            ConvUnit(
                features,
                kernel_size=self.up_kernel_size,
                strides=strides,
                transposed=True,
                conv_only=is_top and self.num_res_units == 0,
                norm=self.norm,
                act=self.act,
                dropout=self.dropout,
            )
        ]
        if self.num_res_units > 0:
            units.append(
                ResidualUnit(
                    features,
                    strides=1,
                    kernel_size=self.kernel_size,
                    subunits=1,
                    last_conv_only=is_top,
                    norm=self.norm,
                    act=self.act,
                    dropout=self.dropout,
                )
            )
        return units

    @nn.compact
    def __call__(self, x, training: bool = False, norm_axis: str | None = None,
                 phase_logits: bool = False):
        """Forward. With ``phase_logits`` the output stays subpixel
        phase-major at HALF resolution — (N, *S/2, 2^nd * out_channels),
        phase-major channel order; ``fast_conv.depth_to_space`` of it is
        the ordinary output. Voxel-permutation-invariant consumers (the
        Dice training loss) use it to skip the final depth-to-space and
        the full-resolution logits materialization entirely. Requires
        even output dims; when the top stage did not run in phase space
        the output is space-to-depth'd to keep the contract uniform."""
        if x.ndim != self.spatial_dims + 2:
            raise ValueError(
                f"expected (N, *spatial[{self.spatial_dims}], C) input, got {x.shape}"
            )
        channels = list(self.channels)
        strides = list(self.strides)
        if len(channels) < 2:
            raise ValueError("channels must have at least 2 entries")
        if len(strides) != len(channels) - 1:
            raise ValueError("len(strides) must be len(channels) - 1")

        # encoder
        skips = []
        y = x
        for level, (c, s) in enumerate(zip(channels[:-1], strides)):
            y = self._down(c, s, is_top=level == 0)(y, training, norm_axis)
            skips.append(y)

        # bottom (stride 1)
        y = self._down(channels[-1], 1, is_top=False)(y, training, norm_axis)

        # decoder: deepest level outputs channels[level-1] except the top,
        # which maps straight to out_channels
        for level in reversed(range(len(strides))):
            y = jnp.concatenate([skips[level], y], axis=-1)
            is_top = level == 0
            out_feats = self.out_channels if is_top else channels[level - 1]
            if self._phase_stage_ok(y.shape, out_feats, strides[level]):
                # run the whole stage in subpixel phase space: the
                # conv_transpose's phase tensor carries the 2x-upsampled
                # volume at input resolution; norm/act/3^3-convs/residual
                # all run phase-major (exact), with ONE depth-to-space at
                # the end. Differentiable (pure XLA) — used in training
                # and eval; the tiny-C full-resolution stages were the
                # most expensive part of both passes on TPU.
                y = ConvUnit(
                    out_feats,
                    kernel_size=self.up_kernel_size,
                    strides=strides[level],
                    transposed=True,
                    norm=self.norm,
                    act=self.act,
                    dropout=self.dropout,
                    phase="out",
                )(y, training, norm_axis)
                y = ResidualUnit(
                    out_feats,
                    strides=1,
                    kernel_size=self.kernel_size,
                    subunits=1,
                    last_conv_only=is_top,
                    norm=self.norm,
                    act=self.act,
                    dropout=self.dropout,
                    phase=True,
                )(y, training, norm_axis)
                if is_top and phase_logits:
                    return y
                y = fast_conv.depth_to_space(y, out_feats)
                continue
            for unit in self._up(out_feats, strides[level], is_top=is_top):
                y = unit(y, training, norm_axis)
        if phase_logits:
            if any(s % 2 for s in y.shape[1:-1]):
                raise ValueError(
                    "phase_logits=True requires even output spatial dims, "
                    f"got {y.shape[1:-1]}"
                )
            y = fast_conv.space_to_depth(y)
        return y
