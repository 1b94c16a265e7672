"""Space-to-depth conv reformulations for tiny-channel UNet stages.

XLA's TPU convolutions place channels in the 128-wide lane dimension; the
top of a segmentation UNet (in_channels=1 stems, num_classes~8 heads,
stride-2 up/down at full resolution) runs at <10% lane occupancy and, for
strided/transposed forms, materializes zero-dilated intermediates. Measured
on v5e (exp/bwd_probe.py, 8x96^3 bf16 flagship): the three tiny-C stages
cost ~70 ms of the 155 ms fwd+bwd while holding <5% of the FLOPs.

This module rewrites those convs — losslessly, autodiff-friendly, pure
XLA — onto half-resolution grids where 2x2x2 spatial blocks are folded
into channels (space-to-depth), so the lanes are 8x denser and no dilated
zeros are ever materialized:

- ``s2d_conv``: stride-2 kernel-3 SAME conv  ==  kernel-2 conv at half
  resolution over the space-to-depth input (exact; XLA-SAME pad (0,1)).
- ``subpixel_conv_transpose``: stride-2 kernel-3 SAME conv_transpose ==
  kernel-2 conv at input resolution producing 2^nd phase-expanded output
  channels, then depth-to-space (the classic subpixel/PixelShuffle
  factorization, here matched bit-for-bit to ``lax.conv_transpose``'s
  SAME padding).
- ``s2d_conv_s1``: stride-1 kernel-3 SAME conv over C<=8 at high
  resolution == kernel-3 conv at half resolution between space-to-depth
  phases (8x redundant FLOPs through structurally-zero weight slots, but
  8x denser lanes). STATUS: measured 0.90x on v5e (exp/fastconv_ab.py) —
  XLA's im2col patch materialization dominates regardless of lane density,
  so this variant is NOT routed by the model; stride-1 tiny-C stages go
  through the Pallas batch-packed kernel instead (ops/pallas_conv.py).

Measured v5e wins (exp/fastconv_ab.py, 8x96^3 bf16 flagship, fwd+dx+dw):
s2d stem 1->16 @96^3: 16.2 -> 10.1 ms (1.61x); subpixel convT 32->8
@48->96: 17.4 -> 15.6 ms (1.12x, grads 8.1 -> 5.2 ms). Wider convT stages
lose to the native lowering, hence the tight eligibility gates.

The weight expansions are single einsums against tiny constant 0/1
selection tensors, so parameters stay in the ordinary flax DHWIO layout
and gradients flow through the einsum (dw is automatically the collapsed
sum over the structural slots).

reference: the stages being accelerated implement the MONAI UNet topology
of src/segmantic/seg/monai_unet.py:114-124; numerics are tested against
``lax.conv_general_dilated``/``lax.conv_transpose`` directly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "s2d_conv",
    "s2d_conv_s1",
    "subpixel_conv_transpose",
    "subpixel_phase_conv",
    "subpixel_phase_conv_k2",
    "phase_pointwise_conv",
    "phase_concat",
    "phase_conv_s1",
    "phase_conv_s1_k2",
    "rephase_half_shift",
    "expand_s1_kernel",
    "expand_s1_kernel_k2",
    "tile_phase",
    "depth_to_space",
    "s2d_eligible",
    "s2d_s1_eligible",
    "subpixel_eligible",
]


@lru_cache(maxsize=None)
def _sel_fwd() -> np.ndarray:
    """S[a, p_in, t] for stride-2 k3 SAME: tap t hits block a, phase p_in.

    y[d] = sum_t w[t] * x[2d + t]  (XLA SAME pad for k=3,s=2,even size is
    (lo,hi)=(0,1)); position 2d+t lives in block d + t//2, phase t%2.
    """
    s = np.zeros((2, 2, 3), np.float32)
    for t in range(3):
        s[t // 2, t % 2, t] = 1.0
    return s


@lru_cache(maxsize=None)
def _sel_transpose() -> np.ndarray:
    """S[a, p_out, t] for stride-2 k3 SAME conv_transpose.

    lax SAME padding for k=3,s=2 is (lo,hi)=(2,1) on the dilated input, so
    y[2d]   = w[0]*x[d-1] + w[2]*x[d]
    y[2d+1] = w[1]*x[d]
    i.e. a kernel-2 conv over blocks (a=0 -> x[d-1], a=1 -> x[d], left pad 1).
    """
    s = np.zeros((2, 2, 3), np.float32)
    s[0, 0, 0] = 1.0  # block d-1 contributes tap 0 to phase 0
    s[1, 0, 2] = 1.0  # block d   contributes tap 2 to phase 0
    s[1, 1, 1] = 1.0  # block d   contributes tap 1 to phase 1
    return s


@lru_cache(maxsize=None)
def _sel_s1() -> np.ndarray:
    """V[a, p_in, p_out, t] for stride-1 k3 SAME in block space.

    y[2d+po] = sum_t w[t] * x[2d+po+t-1]; input position 2(d+a-1)+pi
    matches tap t = 2a + pi - po - 1 when 0 <= t < 3.
    """
    v = np.zeros((3, 2, 2, 3), np.float32)
    for a in range(3):
        for pi in range(2):
            for po in range(2):
                t = 2 * a + pi - po - 1
                if 0 <= t < 3:
                    v[a, pi, po, t] = 1.0
    return v


def _space_to_depth(x: jax.Array) -> jax.Array:
    """(B, *S, C) -> (B, *S/2, 2^nd * C); phase-major channel order."""
    nd = x.ndim - 2
    b, c = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    shape = (b,) + sum(((s // 2, 2) for s in sp), ()) + (c,)
    x = x.reshape(shape)
    # (B, D/2, 2, H/2, 2, W/2, 2, C) -> (B, D/2, H/2, W/2, 2, 2, 2, C)
    perm = (0,) + tuple(1 + 2 * i for i in range(nd)) + tuple(
        2 + 2 * i for i in range(nd)) + (1 + 2 * nd,)
    x = jnp.transpose(x, perm)
    return x.reshape((b,) + tuple(s // 2 for s in sp) + (2**nd * c,))


def _depth_to_space(x: jax.Array, c_out: int) -> jax.Array:
    """(B, *S, 2^nd * C) -> (B, *2S, C); inverse of phase-major packing."""
    nd = x.ndim - 2
    b = x.shape[0]
    sp = x.shape[1:-1]
    x = x.reshape((b,) + tuple(sp) + (2,) * nd + (c_out,))
    # (B, D, H, W, 2, 2, 2, C) -> (B, D, 2, H, 2, W, 2, C)
    perm = (0,) + sum(((1 + i, 1 + nd + i) for i in range(nd)), ()) + (1 + 2 * nd,)
    x = jnp.transpose(x, perm)
    return x.reshape((b,) + tuple(2 * s for s in sp) + (c_out,))


def _dn(nd: int):
    spatial = "DHW"[-nd:] if nd <= 3 else None
    if spatial is None:
        raise ValueError("only 1-3 spatial dims supported")
    return ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")


def _expand_letters(nd: int):
    taps = "tuv"[:nd]
    blocks = "abc"[:nd]
    return taps, blocks


def s2d_eligible(x_shape, kernel, strides) -> bool:
    nd = len(x_shape) - 2
    if nd not in (2, 3):
        return False
    if tuple(kernel) != (3,) * nd or tuple(strides) != (2,) * nd:
        return False
    if any(s % 2 for s in x_shape[1:-1]):
        return False
    return x_shape[-1] <= 4  # tiny-C stems only: s2d wins by lane density


def s2d_s1_eligible(x_shape, kernel, strides) -> bool:
    nd = len(x_shape) - 2
    if nd != 3:
        return False
    if tuple(kernel) != (3,) * nd or tuple(strides) != (1,) * nd:
        return False
    if any(s % 2 for s in x_shape[1:-1]):
        return False
    # 8x structurally-zero FLOPs only pay off at tiny C and big spatial
    return x_shape[-1] <= 8 and min(x_shape[1:-1]) >= 64


def subpixel_eligible(x_shape, c_out, kernel, strides) -> bool:
    nd = len(x_shape) - 2
    if nd not in (2, 3):
        return False
    if tuple(kernel) != (3,) * nd or tuple(strides) != (2,) * nd:
        return False
    # measured: only the narrow head (phase-expanded co <= 64) wins on v5e
    return (2**nd) * c_out <= 64


def s2d_conv(x: jax.Array, w: jax.Array, bias: jax.Array | None = None):
    """Stride-2 kernel-3 SAME conv via space-to-depth (exact XLA-SAME match).

    x: (B, *S, Ci) with even S; w: (*3^nd, Ci, Co). Returns (B, *S/2, Co).
    """
    nd = x.ndim - 2
    ci, co = w.shape[-2], w.shape[-1]
    taps, blocks = _expand_letters(nd)
    phases = "PQR"[:nd]
    sel = jnp.asarray(_sel_fwd(), w.dtype)
    # wsub[a..., (p... i), o]
    ein = (
        f"{taps}io,"
        + ",".join(f"{b}{p}{t}" for b, p, t in zip(blocks, phases, taps))
        + f"->{blocks}{phases}io"
    )
    wsub = jnp.einsum(ein, w, *([sel] * nd))
    wsub = wsub.reshape((2,) * nd + (2**nd * ci, co))
    xb = _space_to_depth(x)
    y = jax.lax.conv_general_dilated(
        xb, wsub.astype(x.dtype), window_strides=(1,) * nd,
        padding=((0, 1),) * nd, dimension_numbers=_dn(nd))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def subpixel_phase_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """The phase-space half of the subpixel conv_transpose: returns the
    phase tensor (B, *S, 2^nd * Co) at INPUT resolution (phase-major
    channel order; ``_depth_to_space`` of it is the conv_transpose output).

    Exposed so executors can keep whole decoder stages in phase space —
    elementwise ops, 3^3 stride-1 convs (:func:`phase_conv_s1`), and
    residual adds all commute with depth-to-space."""
    nd = x.ndim - 2
    ci, co = w.shape[-2], w.shape[-1]
    taps, blocks = _expand_letters(nd)
    phases = "PQR"[:nd]
    sel = jnp.asarray(_sel_transpose(), w.dtype)
    ein = (
        f"{taps}io,"
        + ",".join(f"{b}{p}{t}" for b, p, t in zip(blocks, phases, taps))
        + f"->{blocks}i{phases}o"
    )
    wsub = jnp.einsum(ein, w, *([sel] * nd))
    wsub = wsub.reshape((2,) * nd + (ci, 2**nd * co))
    return jax.lax.conv_general_dilated(
        x, wsub.astype(x.dtype), window_strides=(1,) * nd,
        padding=((1, 0),) * nd, dimension_numbers=_dn(nd))


def subpixel_phase_conv_k2(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-2 KERNEL-2 SAME conv_transpose (the exact-2x "deconv" of
    UNETR/SegResNet-style decoders — no tap overlap) as a POINTWISE phase
    conv: returns the phase tensor (B, *S, 2^nd * Co) at input resolution
    whose :func:`depth_to_space` is the ``lax.conv_transpose`` output.

    Derivation (measured against lax, test-pinned): for k=2, s=2, SAME,
    ``y[2d + p] = w[1 - p] · x[d]`` per axis — each output phase sees
    exactly one tap, so the whole upsample is one dense (Ci -> 2^nd*Co)
    matmul with the spatially REVERSED kernel. This is what lets UNETR's
    full-resolution feature_size=16 stages stay lane-packed: the deconv
    output never materializes at 8x-padded full resolution.

    x: (B, *S, Ci); w: (*2^nd, Ci, Co).
    """
    nd = x.ndim - 2
    ci, co = w.shape[-2], w.shape[-1]
    wr = w[(slice(None, None, -1),) * nd]  # tap 1-p feeds phase p
    perm = (nd,) + tuple(range(nd)) + (nd + 1,)
    wp = jnp.transpose(wr, perm).reshape(ci, (2**nd) * co)
    return jnp.einsum("...i,io->...o", x, wp.astype(x.dtype))


def phase_pointwise_conv(p: jax.Array, w: jax.Array,
                         bias: jax.Array | None = None) -> jax.Array:
    """Kernel-1 conv applied IN phase space: block-diagonal over phases
    (every output phase-channel (ph, o) reads only input (ph, i)), so it
    is one shared (Ci -> Co) matmul on the (…, 2^nd, Ci) view. Exact."""
    nd = p.ndim - 2
    g = 2**nd
    ci, co = w.shape[-2], w.shape[-1]
    y = p.reshape(p.shape[:-1] + (g, ci))
    y = jnp.einsum("...gi,io->...go", y, w.reshape(ci, co).astype(p.dtype))
    y = y.reshape(p.shape[:-1] + (g * co,))
    if bias is not None:
        y = y + tile_phase(bias, nd).astype(y.dtype)
    return y


def phase_concat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel-concat two phase-major tensors so the result is the
    phase-major tensor of the full-resolution channel concat (reshape to
    (…, 2^nd, C), concat on the true-channel axis, collapse back)."""
    nd = a.ndim - 2
    g = 2**nd
    ca, cb = a.shape[-1] // g, b.shape[-1] // g
    av = a.reshape(a.shape[:-1] + (g, ca))
    bv = b.reshape(b.shape[:-1] + (g, cb))
    y = jnp.concatenate([av, bv], axis=-1)
    return y.reshape(a.shape[:-1] + (g * (ca + cb),))


def subpixel_conv_transpose(x: jax.Array, w: jax.Array,
                            bias: jax.Array | None = None):
    """Stride-2 kernel-3 SAME conv_transpose via subpixel phase expansion.

    x: (B, *S, Ci); w: (*3^nd, Ci, Co). Returns (B, *2S, Co), bit-matching
    ``lax.conv_transpose(padding="SAME", transpose_kernel=False)``.
    """
    co = w.shape[-1]
    y = _depth_to_space(subpixel_phase_conv(x, w), co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def expand_s1_kernel(w: jax.Array) -> jax.Array:
    """Block-space expansion of a stride-1 kernel-3 SAME conv kernel:
    (*3^nd, Ci, Co) -> (*3^nd, 2^nd*Ci, 2^nd*Co), phase-major channels.

    ``conv3_SAME(x) == d2s(conv_SAME(s2d(x), expand_s1_kernel(w)))`` —
    the :func:`s2d_conv_s1` identity. 7/8 of the expanded weights are
    structural zeros (redundant FLOPs for dense lanes)."""
    nd = w.ndim - 2
    ci, co = w.shape[-2], w.shape[-1]
    taps, blocks = _expand_letters(nd)
    pin, pout = "PQR"[:nd], "XYZ"[:nd]
    sel = jnp.asarray(_sel_s1(), w.dtype)
    ein = (
        f"{taps}io,"
        + ",".join(f"{b}{i_}{o_}{t}" for b, i_, o_, t in
                   zip(blocks, pin, pout, taps))
        + f"->{blocks}{pin}i{pout}o"
    )
    wsub = jnp.einsum(ein, w, *([sel] * nd))
    return wsub.reshape((3,) * nd + (2**nd * ci, 2**nd * co))


@lru_cache(maxsize=None)
def _sel_s1_k2() -> np.ndarray:
    """T[a, q, po, t] for stride-1 k3 SAME as a kernel-2 conv over the
    half-block-shifted re-phasing P'[e].q = x[2e-1+q]:
    y[2d+po] = sum_t w[t] x[2d+po+t-1]; the P' component x[2(d+a)-1+q]
    matches tap t = 2a + q - po when 0 <= t < 3 (6 of 8 (a,q,po) combos)."""
    tsel = np.zeros((2, 2, 2, 3), np.float32)
    for a in range(2):
        for q in range(2):
            for po in range(2):
                t = 2 * a + q - po
                if 0 <= t < 3:
                    tsel[a, q, po, t] = 1.0
    return tsel


def rephase_half_shift(p: jax.Array) -> jax.Array:
    """Phase-major (B, *S, 2^nd*C) -> the half-block-shifted pairing P'
    with spatial size S+1 per axis: P'[e].q = x[2e-1+q] at full-res
    position 2e-1+q (zero outside the hull, i.e. the SAME zero pad).

    This is the relayout that makes the stride-1 k3 conv DENSE in block
    space: the union of the true 3^nd windows of all 2^nd output phases
    of block d is the 4^nd full-res window [2d-1, 2d+2], which is exactly
    P'[d] ++ P'[d+1] — so the conv becomes kernel-2^nd over 2^nd*C dense
    lanes (contraction 2^nd * 2^nd * C) instead of kernel-3^nd with 7/8
    structural zeros. One extra copy of the tensor buys a 27/8 = 3.375x
    FLOP cut (the same GEMM as the ROUND_NOTES implicit-GEMM derivation,
    but riding XLA's conv pipeline instead of a custom kernel)."""
    nd = p.ndim - 2
    b = p.shape[0]
    c = p.shape[-1] >> nd
    sp = p.shape[1:-1]
    x = p.reshape((b,) + tuple(sp) + (2,) * nd + (c,))
    for k in range(nd):
        ax_sp = 1 + k
        ax_ph = 1 + nd + k
        ph0 = jax.lax.index_in_dim(x, 0, axis=ax_ph, keepdims=True)
        ph1 = jax.lax.index_in_dim(x, 1, axis=ax_ph, keepdims=True)
        pad1 = [(0, 0)] * x.ndim
        pad1[ax_sp] = (1, 0)  # q=0 slot: phase 1 of block e-1
        pad0 = [(0, 0)] * x.ndim
        pad0[ax_sp] = (0, 1)  # q=1 slot: phase 0 of block e
        x = jnp.concatenate(
            [jnp.pad(ph1, pad1), jnp.pad(ph0, pad0)], axis=ax_ph
        )
    out_sp = tuple(s + 1 for s in sp)
    return x.reshape((b,) + out_sp + (p.shape[-1],))


def expand_s1_kernel_k2(w: jax.Array) -> jax.Array:
    """Kernel-2 block-space expansion of a stride-1 kernel-3 SAME conv
    kernel for the :func:`rephase_half_shift` pairing:
    (*3^nd, Ci, Co) -> (*2^nd, 2^nd*Ci, 2^nd*Co), phase-major channels
    (input lanes in P' q-order, output lanes in standard phase order).
    27/64 of the expanded weights are nonzero (vs 1/8 for the kernel-3
    expansion in :func:`expand_s1_kernel`)."""
    nd = w.ndim - 2
    ci, co = w.shape[-2], w.shape[-1]
    taps, blocks = _expand_letters(nd)
    qin, pout = "PQR"[:nd], "XYZ"[:nd]
    sel = jnp.asarray(_sel_s1_k2(), w.dtype)
    ein = (
        f"{taps}io,"
        + ",".join(f"{a}{q}{o}{t}" for a, q, o, t in
                   zip(blocks, qin, pout, taps))
        + f"->{blocks}{qin}i{pout}o"
    )
    wsub = jnp.einsum(ein, w, *([sel] * nd))
    return wsub.reshape((2,) * nd + (2**nd * ci, 2**nd * co))


def phase_conv_s1_k2(p: jax.Array, w: jax.Array) -> jax.Array:
    """:func:`phase_conv_s1` at 3.375x fewer MXU FLOPs: re-phase to the
    half-block-shifted pairing (one relayout copy), then a kernel-2^nd
    VALID conv with dense 2^nd*C lanes. Exact (same SAME-zero-pad
    semantics); output is the standard phase-major tensor."""
    nd = p.ndim - 2
    wsub = expand_s1_kernel_k2(w)
    return jax.lax.conv_general_dilated(
        rephase_half_shift(p), wsub.astype(p.dtype),
        window_strides=(1,) * nd, padding="VALID",
        dimension_numbers=_dn(nd))


def _phase_k2_on() -> bool:
    import os

    return os.environ.get("SEGMANTIC_PHASE_K2", "off").lower() not in (
        "0", "off", "false",
    )


def _phase_gemm_mode() -> str:
    """SEGMANTIC_PHASE_GEMM: off | on (full Pallas) | hybrid (XLA fwd +
    Pallas bwd) | auto (route by grid size; the default) | xdx (XLA fwd +
    forward-style XLA dp — any backend, 3D only)."""
    import os

    return os.environ.get("SEGMANTIC_PHASE_GEMM", "auto").lower()


def _phase_conv_xla_k3(p: jax.Array, w: jax.Array) -> jax.Array:
    nd = p.ndim - 2
    wsub = expand_s1_kernel(w)
    return jax.lax.conv_general_dilated(
        p, wsub.astype(p.dtype), window_strides=(1,) * nd,
        padding=((1, 1),) * nd, dimension_numbers=_dn(nd))


@jax.custom_vjp
def _phase_conv_hybrid(p: jax.Array, w: jax.Array) -> jax.Array:
    """XLA expanded-k3 forward (the strongest fwd lowering at large grids)
    with the Pallas implicit-GEMM backward (dx = fwd kernel on the
    flipped/io-swapped weights, dw = transposed-GEMM kernel)."""
    return _phase_conv_xla_k3(p, w)


def _phase_conv_hybrid_fwd(p, w):
    return _phase_conv_xla_k3(p, w), (p, w)


def _phase_conv_hybrid_bwd(res, g):
    from . import phase_gemm

    p, w = res
    dp = phase_gemm.phase_conv_gemm(g, phase_gemm._flip_io(w))
    dw = phase_gemm.phase_conv_gemm_dw(p, g, w)
    return dp, dw


_phase_conv_hybrid.defvjp(_phase_conv_hybrid_fwd, _phase_conv_hybrid_bwd)


@jax.custom_vjp
def _phase_conv_xdx(p: jax.Array, w: jax.Array) -> jax.Array:
    """XLA expanded-k3 conv with an XLA FORWARD-STYLE dp: XLA's autodiff of
    the expanded conv lowers dp as a transposed conv and (measured,
    exp/hlo_cycles.py b96) inserts three full-tensor relayout copies around
    it in the d0 decoder backward. dp of a SAME stride-1 conv IS the same
    conv with the spatially-flipped, io-swapped kernel (the identity the
    Pallas VJP in ops/phase_gemm.py already uses and autodiff-tests), so
    re-expressing dp as a plain forward conv keeps the strong forward
    lowering on both sides. dw replays XLA's own vjp (it was not the copy
    source).

    MEASURED A WASH at the production b96 step (exp/phasegemm_model_ab.py
    96 off xdx: 365.9 vs 367.1 ms interleaved, losses bit-identical) — the
    cost model's 68.5 ms relayout estimate does not survive integration;
    XLA re-inserts equivalent layout work around the forward-style dp.
    Kept for targeted use (exact, autodiff-tested) but not routed."""
    return _phase_conv_xla_k3(p, w)


def _phase_conv_xdx_fwd(p, w):
    return _phase_conv_xla_k3(p, w), (p, w)


def _phase_conv_xdx_bwd(res, g):
    from . import phase_gemm

    p, w = res
    dp = _phase_conv_xla_k3(g, phase_gemm._flip_io(w))
    _, vjp_w = jax.vjp(lambda ww: _phase_conv_xla_k3(p, ww), w)
    (dw,) = vjp_w(g)
    return dp, dw


_phase_conv_xdx.defvjp(_phase_conv_xdx_fwd, _phase_conv_xdx_bwd)

# grid steps (B*D) below which the FOLDED (L=64) Pallas forward beats
# XLA's expanded-k3 lowering (measured: d0 1536 steps 1.30x, 4608 steps
# 0.86x; the direct L>=128 kernel wins at every measured grid — d1 b96
# 1.32x — so it routes unconditionally). exp/phasegemm_vjp_ab.py.
_PHASE_GEMM_FWD_MAX_STEPS = 2500


def phase_conv_s1(p: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 kernel-3 SAME conv applied IN phase space: ``p`` is a
    phase-major tensor (B, *S, 2^nd*Ci) representing the full-resolution
    volume d2s(p); returns the phase tensor of conv3_SAME(d2s(p), w).

    Routing (3D, TPU, supported shapes): the Pallas implicit-GEMM op
    (ops/phase_gemm — 3.375x FLOP cut over the 8x-structural-zero expanded
    conv) carries the backward always and the forward when the (B, D) grid
    is small enough that it beats XLA's lowering; SEGMANTIC_PHASE_GEMM
    selects off / on / hybrid / auto / xdx (xdx = XLA fwd with the dp
    re-expressed as a forward conv on flipped/io-swapped weights — runs on
    any backend, 3D only). Off TPU (or unsupported shapes) the
    expanded-k3 XLA conv runs (SEGMANTIC_PHASE_K2=on selects the k2
    re-phased XLA variant instead — a characterized negative on TPU)."""
    nd = p.ndim - 2
    mode = _phase_gemm_mode()
    if mode == "xdx" and nd == 3:
        return _phase_conv_xdx(p, w)
    if (mode != "off" and nd == 3 and jax.default_backend() == "tpu"
            and w.shape[-2] == w.shape[-1]):
        # the implicit-GEMM kernels operate on square (L, L) expanded
        # weights — ci == co only (always true for the UNet phase stages;
        # UNETR's packed concat/projection convs are ci != co and take the
        # exact XLA expanded-conv path below)
        from . import phase_gemm

        if phase_gemm.supported(p.shape, p.dtype):
            if mode == "on":
                return phase_gemm.phase_conv(p, w)
            if mode == "hybrid":
                return _phase_conv_hybrid(p, w)
            if mode == "auto":
                folded = phase_gemm._fold_ok(p.shape)
                steps = p.shape[0] * p.shape[1]
                if not folded or steps <= _PHASE_GEMM_FWD_MAX_STEPS:
                    return phase_gemm.phase_conv(p, w)
                return _phase_conv_hybrid(p, w)
    if _phase_k2_on():
        return phase_conv_s1_k2(p, w)
    return _phase_conv_xla_k3(p, w)


def tile_phase(v: jax.Array, nd: int) -> jax.Array:
    """Per-true-channel vector (C,) -> per-phase-channel (2^nd * C,) in
    phase-major order (phases repeat the channel block)."""
    return jnp.tile(v, 2**nd)


def depth_to_space(p: jax.Array, c_out: int) -> jax.Array:
    """Public phase-major depth-to-space: (B, *S, 2^nd*C) -> (B, *2S, C)."""
    return _depth_to_space(p, c_out)


def space_to_depth(x: jax.Array) -> jax.Array:
    """Public phase-major space-to-depth: (B, *S, C) -> (B, *S/2, 2^nd*C).
    Inverse of :func:`depth_to_space` (even spatial dims required)."""
    return _space_to_depth(x)


def s2d_conv_s1(x: jax.Array, w: jax.Array, bias: jax.Array | None = None):
    """Stride-1 kernel-3 SAME conv for tiny C via block-space kernel-3 conv.

    x: (B, *S, Ci) with even S; w: (*3^nd, Ci, Co). Returns (B, *S, Co).
    Runs at half resolution with 2^nd-times denser channels; the expanded
    weight tensor is 7/8 structural zeros (redundant MXU FLOPs traded for
    dense lanes — gate with :func:`s2d_s1_eligible`).
    """
    co = w.shape[-1]
    y = _depth_to_space(phase_conv_s1(_space_to_depth(x), w), co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
