"""Pallas fused 3D convolution with batch-packed lanes (UNet hot stages).

XLA's TPU lowering of small-channel 3x3x3 convs materializes im2col patches
in HBM (~27x traffic) and runs the GEMM at N=C_out lanes (C=8..32 of 128 —
most of the MXU idle). This kernel restores both:

- the batch dimension is PACKED INTO LANES: x (B,D,H,W,C) is transposed to
  (D,H,W, B*C), so a (B=8, C=16) stage fills all 128 lanes densely and the
  DMA carries no lane padding;
- patches are built in VMEM: SAME padding happens once outside; the H halo
  comes from three H-shifted views, the D halo from block-size-1 depth
  indexing (offset d+dz) with dz the innermost grid axis accumulating into
  an f32 VMEM scratch. HBM read traffic is ~3x the input instead of 27x;
- the per-step GEMM is (TH*W, 9*B*C) x (9*B*C, B*C_out) — K and N both
  ~128+ so the MXU runs dense; the weight matrix is block-diagonal over the
  batch (built with an einsum against eye(B)), trading 8x redundant FLOPs
  for full utilization — a large net win at these shapes (measured 1.6-3.2x
  over the XLA conv, transposes included);
- fused epilogue: bias, optional per-channel scale/shift (folded
  inference-mode norm) and PReLU/ReLU.

STATUS: wins 1.3-1.7x standalone (v5e, honest same-session comparison), but
per-op dispatch inside the full UNet loses to XLA's conv+norm+act fusion
and layout choices (see models/unet.py::DispatchConv3D). It ships as a
tested op; making the packed layout persist across a whole inference graph
is the planned follow-up. Training keeps XLA convs regardless (batch-norm
statistics need the full batch). reference model topology:
src/segmantic/seg/monai_unet.py:114-124.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_th(h: int, w: int, bc: int, bco: int) -> int:
    """Largest H tile that divides H and fits the VMEM working set."""
    lanes_in = max(bc, 128)
    for th in (32, 24, 16, 12, 8, 4, 2, 1):
        if h % th:
            continue
        views = 3 * th * (w + 2) * lanes_in * 2 * 2  # x2 double buffering
        patches = th * w * max(9 * bc, 128) * 2
        acc = th * w * max(bco, 128) * 4
        wmat = 9 * bc * max(bco, 128) * 2
        if views + patches + acc + wmat < _VMEM_BUDGET:
            return th
    return 1


def supported(x_shape: Tuple[int, ...], c_out: int,
              kernel: Tuple[int, ...] = (3, 3, 3),
              strides: Tuple[int, ...] = (1, 1, 1)) -> bool:
    """Static eligibility for the batch-packed kernel."""
    if len(x_shape) != 5:
        return False
    if tuple(kernel) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return False
    b, d, h, w, c = x_shape
    bc, bco = b * c, b * c_out
    if w % 8 != 0 or w < 8 or d < 1:
        return False
    if bc < 64 or bc > 512 or bco > 512:  # lane packing sweet spot
        return False
    return _pick_th(h, w, bc, bco) >= 2


def _kernel(v0, v1, v2, wref, scale, bias, alpha, out, acc,
            *, TH, W, BC, BCO, relu_mode):
    dz = pl.program_id(2)

    @pl.when(dz == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    slabs = []
    for v in (v0, v1, v2):  # dy = 0, 1, 2
        plane = v[0]  # (TH, W+2, BC)
        for dx in range(3):
            slabs.append(plane[:, dx : dx + W, :].reshape(TH * W, BC))
    patches = jnp.concatenate(slabs, axis=1)  # (TH*W, 9*BC)
    acc[...] += jnp.dot(patches, wref[0], preferred_element_type=jnp.float32)

    @pl.when(dz == 2)
    def _():
        y = acc[...] * scale[0] + bias[0]
        if relu_mode == "prelu":
            y = jnp.where(y >= 0, y, alpha[0] * y)
        elif relu_mode == "relu":
            y = jnp.maximum(y, 0)
        out[0] = y.reshape(TH, W, BCO).astype(out.dtype)


def pack_batch(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (D, H, W, B*C): batch packed into lanes."""
    B, D, H, W, C = x.shape
    return jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(D, H, W, B * C)


def unpack_batch(xp: jax.Array, batch: int) -> jax.Array:
    """(D, H, W, B*C) -> (B, D, H, W, C): inverse of :func:`pack_batch`."""
    D, H, W, BC = xp.shape
    return jnp.transpose(
        xp.reshape(D, H, W, batch, BC // batch), (3, 0, 1, 2, 4)
    )


def pack_weights(weights: jax.Array, batch: int, dtype) -> jax.Array:
    """Block-diagonal packed weights: (3,3,3,C,CO) -> (3, 9*B*C, B*CO).

    w2[dz, (dy*3+dx)*BC + b*C+ci, b*CO+co] — the per-batch diagonal blocks
    carry the conv; the off-diagonal zeros are the FLOP padding that buys
    dense lanes."""
    C, CO = weights.shape[-2], weights.shape[-1]
    eye_b = jnp.eye(batch, dtype=dtype)
    return jnp.einsum(
        "zyxio,ab->zyxaibo", weights.astype(dtype), eye_b
    ).reshape(3, 9 * batch * C, batch * CO)


def conv3d_packed_p(
    xp: jax.Array,  # (D, H, W, B*C) packed input (pack_batch)
    batch: int,
    w2: jax.Array,  # (3, 9*B*C, B*CO) packed weights (pack_weights)
    bias: Optional[jax.Array] = None,  # (CO,)
    scale: Optional[jax.Array] = None,  # (CO,) folded-norm scale on conv out
    shift: Optional[jax.Array] = None,  # (CO,) folded-norm shift
    alpha: Optional[jax.Array] = None,  # (1,) PReLU slope
    relu_mode: str = "none",  # none | relu | prelu
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Packed-in/packed-out fused stride-1 SAME 3^3 conv (+ epilogue).

    The packed-layout building block: callers that chain several stride-1
    convs (a residual unit, a decoder stage) pack once, run every conv and
    the residual adds in (D, H, W, B*C) lane-dense layout, and unpack once.
    Epilogue math: y = (conv(x) + bias) * scale + shift, then activation.
    """
    D, H, W, BC = xp.shape
    BCO = w2.shape[-1]
    C, CO = BC // batch, BCO // batch
    out_dtype = out_dtype or xp.dtype
    TH = _pick_th(H, W, BC, BCO)

    xpad = jnp.pad(xp, ((1, 1), (1, 1), (1, 1), (0, 0)))
    views = [xpad[:, dy : dy + H, :, :] for dy in range(3)]

    scale_v = jnp.ones((CO,), jnp.float32) if scale is None else scale.astype(jnp.float32)
    shift_v = jnp.zeros((CO,), jnp.float32) if shift is None else shift.astype(jnp.float32)
    bias_v = jnp.zeros((CO,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    # (conv + bias) * scale + shift == conv * scale + (bias*scale + shift)
    eff_scale = jnp.tile(scale_v, batch)[None]  # (1, BCO)
    eff_shift = jnp.tile(bias_v * scale_v + shift_v, batch)[None]
    alpha_v = (jnp.zeros((1, 1), jnp.float32) if alpha is None
               else alpha.astype(jnp.float32).reshape(1, 1))

    def view_spec():
        return pl.BlockSpec(
            (1, TH, W + 2, BC),
            lambda h, d, dz: (d + dz, h, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        partial(_kernel, TH=TH, W=W, BC=BC, BCO=BCO, relu_mode=relu_mode),
        grid=(H // TH, D, 3),
        in_specs=[
            view_spec(),
            view_spec(),
            view_spec(),
            pl.BlockSpec((1, 9 * BC, BCO), lambda h, d, dz: (dz, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BCO), lambda h, d, dz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BCO), lambda h, d, dz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda h, d, dz: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, BCO), lambda h, d, dz: (d, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, W, BCO), out_dtype),
        scratch_shapes=[pltpu.VMEM((TH * W, BCO), jnp.float32)],
        interpret=interpret,
    )(views[0], views[1], views[2], w2, eff_scale, eff_shift, alpha_v)


@partial(jax.jit, static_argnames=("relu_mode", "out_dtype", "interpret"))
def conv3d_pallas(
    x: jax.Array,  # (B, D, H, W, C) channel-last
    weights: jax.Array,  # (3, 3, 3, C, CO) — flax DHWIO order
    bias: Optional[jax.Array] = None,  # (CO,)
    scale: Optional[jax.Array] = None,  # (CO,) folded-norm scale on conv out
    shift: Optional[jax.Array] = None,  # (CO,) folded-norm shift
    alpha: Optional[jax.Array] = None,  # (1,) PReLU slope
    relu_mode: str = "none",  # none | relu | prelu
    out_dtype=None,
    interpret: bool = False,  # pallas interpret mode (CPU testing)
) -> jax.Array:
    """Fused stride-1 SAME 3^3 conv (+bias, folded norm, activation), 3D.

    Epilogue math: y = (conv(x) + bias) * scale + shift, then activation.
    Pack/unpack wrapper over :func:`conv3d_packed_p`.
    """
    B = x.shape[0]
    out = conv3d_packed_p(
        pack_batch(x), B, pack_weights(weights, B, x.dtype),
        bias=bias, scale=scale, shift=shift, alpha=alpha,
        relu_mode=relu_mode, out_dtype=out_dtype, interpret=interpret,
    )
    return unpack_batch(out, B)


def _pick_th_dw(h: int, w: int, bc: int, bco: int) -> int:
    """Largest H tile for the dw kernel's VMEM working set."""
    lanes_in = max(bc, 128)
    lanes_out = max(bco, 128)
    for th in (32, 24, 16, 12, 8, 4, 2, 1):
        if h % th:
            continue
        views = 3 * th * (w + 2) * lanes_in * 2 * 2
        patches = th * w * max(9 * bc, 128) * 2
        dyb = th * w * lanes_out * 2 * 2
        acc = 9 * bc * lanes_out * 4
        if views + patches + dyb + acc < _VMEM_BUDGET:
            return th
    return 1


def _dw_kernel(v0, v1, v2, dyref, out, *, TH, W, BC, BCO):
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        out[...] = jnp.zeros_like(out)

    slabs = []
    for v in (v0, v1, v2):  # dy = 0, 1, 2
        plane = v[0]  # (TH, W+2, BC)
        for dx in range(3):
            slabs.append(plane[:, dx : dx + W, :].reshape(TH * W, BC))
    patches = jnp.concatenate(slabs, axis=1)  # (TH*W, 9*BC)
    dyb = dyref[0].reshape(TH * W, BCO)
    # (9BC, BCO) += patches^T @ dy  — contraction over the TH*W positions
    out[0] += jax.lax.dot_general(
        patches, dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def conv3d_packed_dw(x: jax.Array, dy: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Weight gradient of the stride-1 SAME 3^3 conv, batch-packed.

    Computes dw[t, ci, co] = sum_{b,p} x[b, p + t - 1, ci] * dy[b, p, co]
    as a dense (9*B*C, B*CO) GEMM per depth tap (patches^T @ dy with all
    128 lanes full), then collapses the block-diagonal over the batch.
    The off-diagonal (cross-batch) blocks are redundant FLOPs — the same
    B-times padding the packed forward pays for dense MXU utilization.
    """
    B, D, H, W, C = x.shape
    CO = dy.shape[-1]
    BC, BCO = B * C, B * CO
    TH = _pick_th_dw(H, W, BC, BCO)

    xt = jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(D, H, W, BC)
    xp = jnp.pad(xt, ((1, 1), (1, 1), (1, 1), (0, 0)))
    views = [xp[:, dyv : dyv + H, :, :] for dyv in range(3)]
    dyt = jnp.transpose(dy, (1, 2, 3, 0, 4)).reshape(D, H, W, BCO)

    def view_spec():
        return pl.BlockSpec(
            (1, TH, W + 2, BC),
            lambda dz, h, d: (d + dz, h, 0, 0),
            memory_space=pltpu.VMEM,
        )

    raw = pl.pallas_call(
        partial(_dw_kernel, TH=TH, W=W, BC=BC, BCO=BCO),
        grid=(3, H // TH, D),
        in_specs=[
            view_spec(),
            view_spec(),
            view_spec(),
            pl.BlockSpec((1, TH, W, BCO), lambda dz, h, d: (d, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9 * BC, BCO), lambda dz, h, d: (dz, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 9 * BC, BCO), jnp.float32),
        interpret=interpret,
    )(views[0], views[1], views[2], dyt)

    # collapse the batch block-diagonal: raw[dz, (k, b, ci), (b2, co)] with
    # only b == b2 carrying the true gradient
    raw = raw.reshape(3, 9, B, C, B, CO)
    dw = jnp.einsum("zkbcdo,bd->zkco", raw, jnp.eye(B, dtype=raw.dtype))
    return dw.reshape(3, 3, 3, C, CO)


def packed_vjp_supported(x_shape: Tuple[int, ...], c_out: int,
                         kernel: Tuple[int, ...] = (3, 3, 3),
                         strides: Tuple[int, ...] = (1, 1, 1)) -> bool:
    """Eligibility for the differentiable packed conv (fwd + dx + dw)."""
    if not supported(x_shape, c_out, kernel, strides):
        return False
    b, d, h, w, c = x_shape
    # dx runs the fwd kernel on dy: (B, D, H, W, CO) -> C
    if not supported((b, d, h, w, c_out), c, kernel, strides):
        return False
    return _pick_th_dw(h, w, b * c, b * c_out) >= 2


def packed_route_supported(x_shape: Tuple[int, ...], c_out: int,
                           kernel: Tuple[int, ...] = (3, 3, 3),
                           strides: Tuple[int, ...] = (1, 1, 1)) -> bool:
    """Measured win region for routing model convs through the packed VJP
    (exp/packed_ab.py, v5e): B*C <= 128 wins 1.4-1.5x end-to-end on
    fwd+grads; B*C = 256 already loses to XLA's fusion, so it is gated out."""
    b, c = x_shape[0], x_shape[-1]
    if b * c > 128 or b * c_out > 128:
        return False
    return packed_vjp_supported(x_shape, c_out, kernel, strides)


def packed_route_enabled() -> bool:
    """Process-level switch for routing convs through the Pallas kernels.

    SEGMANTIC_PACKED_CONV = on | off | auto (default). 'auto' enables the
    route on a single-device TPU process only: inside a GSPMD-partitioned
    jit over a >1-device mesh a pallas_call cannot be auto-partitioned (it
    would be replicated or rejected by the SPMD partitioner), so
    multi-device GSPMD steps keep the XLA convs. Multi-device training gets
    the kernels through the shard_map grad path instead, which activates
    :func:`packed_routing` while tracing per-shard code (local shapes, no
    partitioner involved)."""
    import os

    mode = os.environ.get("SEGMANTIC_PACKED_CONV", "auto").lower()
    if mode in ("1", "on", "true"):
        return True
    if mode in ("0", "off", "false"):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


import contextlib
import contextvars

_packed_ctx = contextvars.ContextVar("segmantic_packed_conv_ctx", default=None)


@contextlib.contextmanager
def packed_routing(enabled: Optional[bool]):
    """Trace-time override of the packed-conv routing decision.

    The shard_map train step wraps its per-shard loss/grad body in
    ``packed_routing(True)`` so DispatchConv3D routes on local shapes even
    in a multi-device process; ``packed_routing(False)`` force-disables
    (e.g. for A/B measurement). ``None`` restores the auto rule."""
    token = _packed_ctx.set(enabled)
    try:
        yield
    finally:
        _packed_ctx.reset(token)


def packed_route_active() -> bool:
    """The routing decision DispatchConv3D consults at trace time."""
    override = _packed_ctx.get()
    if override is not None:
        return override
    return packed_route_enabled()


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_packed(x: jax.Array, weights: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Differentiable stride-1 SAME 3^3 conv on the batch-packed Pallas
    kernels: forward and input-gradient share the conv kernel (dx is the
    same conv with the spatially-flipped, io-transposed weights), and the
    weight gradient runs :func:`conv3d_packed_dw`. Gate with
    :func:`packed_vjp_supported`. No bias/epilogue — compose outside."""
    return conv3d_pallas(x, weights, out_dtype=x.dtype, interpret=interpret)


def _packed_fwd(x, weights, interpret):
    y = conv3d_pallas(x, weights, out_dtype=x.dtype, interpret=interpret)
    return y, (x, weights)


def _packed_bwd(interpret, res, dy):
    x, weights = res
    w_flip = jnp.flip(weights, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = conv3d_pallas(dy, w_flip.astype(dy.dtype), out_dtype=x.dtype,
                       interpret=interpret)
    dw = conv3d_packed_dw(x, dy, interpret=interpret)
    return dx, dw.astype(weights.dtype)


conv3d_packed.defvjp(_packed_fwd, _packed_bwd)


def conv3d_reference(x, weights, bias=None, scale=None, shift=None,
                     alpha=None, relu_mode="none", out_dtype=None):
    """XLA reference with identical semantics (for tests)."""
    out_dtype = out_dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        weights.astype(jnp.float32),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    co = weights.shape[-1]
    if bias is not None:
        y = y + bias.reshape((1,) * 4 + (co,))
    if scale is not None:
        y = y * scale.reshape((1,) * 4 + (co,))
    if shift is not None:
        y = y + shift.reshape((1,) * 4 + (co,))
    if relu_mode == "prelu":
        y = jnp.where(y >= 0, y, alpha.reshape(1) * y)
    elif relu_mode == "relu":
        y = jnp.maximum(y, 0)
    return y.astype(out_dtype)
