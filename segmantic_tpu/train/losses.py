"""Segmentation losses (jittable, channel-last logits).

Dice loss semantics match the reference's configuration
``DiceLoss(to_onehot_y=True, softmax=True)``
(reference: src/segmantic/seg/monai_unet.py:128): softmax over channels,
one-hot targets, per-(batch, class) reduction over spatial dims with
smooth_nr = smooth_dr = 1e-5, mean over batch and classes, background
included.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    include_background: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    apply_softmax: bool = True,
) -> jax.Array:
    """Soft Dice loss.

    logits: (N, *spatial, C); labels: (N, *spatial) integer or
    (N, *spatial, C) one-hot.

    The production configuration (softmax + integer labels) runs through an
    analytic custom VJP: plain autodiff carries the full-resolution f32
    softmax probabilities (~0.9 GB at the flagship 32x96^3x8 batch) across
    the fwd/bwd boundary, while the closed-form gradient keeps only the
    per-(batch, class) sums and recomputes the softmax in the backward pass
    as one fused elementwise sweep. Wall-time parity with autodiff
    standalone (11.4 ms both, exp/dice_layout_ab.py); the win is the HBM
    headroom for larger batches. Exactness is test-pinned against the
    autodiff reference (tests/train/test_losses_metrics.py).
    """
    if apply_softmax and labels.ndim == logits.ndim - 1:
        return _dice_int(
            logits, labels, include_background, float(smooth_nr), float(smooth_dr)
        )
    return _dice_reference(
        logits, labels,
        include_background=include_background,
        smooth_nr=smooth_nr, smooth_dr=smooth_dr, apply_softmax=apply_softmax,
    )


def _dice_reference(
    logits, labels, *, include_background, smooth_nr, smooth_dr, apply_softmax
):
    """Autodiff path (one-hot labels or pre-softmaxed inputs)."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) if apply_softmax else logits
    if labels.ndim == logits.ndim - 1:
        onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    else:
        onehot = labels.astype(jnp.float32)

    if not include_background:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]

    spatial_axes = tuple(range(1, probs.ndim - 1))
    intersection = jnp.sum(probs * onehot, axis=spatial_axes)
    denom = jnp.sum(probs, axis=spatial_axes) + jnp.sum(onehot, axis=spatial_axes)
    dice = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dice_int(logits, labels, include_background, smooth_nr, smooth_dr):
    loss, _ = _dice_int_fwd(logits, labels, include_background, smooth_nr, smooth_dr)
    return loss


def _dice_int_fwd(logits, labels, include_background, smooth_nr, smooth_dr):
    num_classes = logits.shape[-1]
    spatial_axes = tuple(range(1, logits.ndim - 1))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    p, y = (probs, onehot) if include_background else (probs[..., 1:], onehot[..., 1:])
    intersection = jnp.sum(p * y, axis=spatial_axes)
    denom = jnp.sum(p, axis=spatial_axes) + jnp.sum(y, axis=spatial_axes)
    dice = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    loss = jnp.mean(1.0 - dice)
    # residuals: the (already live) logits/labels + tiny per-(n, c) sums
    return loss, (logits, labels, intersection, denom)


def _dice_int_bwd(include_background, smooth_nr, smooth_dr, res, g):
    logits, labels, intersection, denom = res
    num_classes = logits.shape[-1]
    n_spatial = logits.ndim - 2

    # loss = mean over (n, c) cells of 1 - (2I+snr)/(D+sdr):
    #   dL/dI = -(g/cells) *  2/(D+sdr)
    #   dL/dD = +(g/cells) * (2I+snr)/(D+sdr)^2
    inv = 1.0 / (denom + smooth_dr)
    scale = g / intersection.size
    d_inter = -scale * 2.0 * inv
    d_denom = scale * (2.0 * intersection + smooth_nr) * inv * inv
    if not include_background:
        pad = [(0, 0)] * d_inter.ndim
        pad[-1] = (1, 0)  # class 0 received no gradient
        d_inter = jnp.pad(d_inter, pad)
        d_denom = jnp.pad(d_denom, pad)

    bshape = (logits.shape[0],) + (1,) * n_spatial + (num_classes,)
    d_inter = d_inter.reshape(bshape)
    d_denom = d_denom.reshape(bshape)

    # one fused sweep: recompute probs, dprobs = dI*onehot + dD, softmax vjp
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    d_probs = d_inter * onehot + d_denom
    inner = jnp.sum(probs * d_probs, axis=-1, keepdims=True)
    d_logits = (probs * (d_probs - inner)).astype(logits.dtype)
    d_labels = np.zeros(labels.shape, dtype=jax.dtypes.float0)
    return (d_logits, d_labels)


_dice_int.defvjp(_dice_int_fwd, _dice_int_bwd)


def dice_loss_phase(
    phase_logits: jax.Array,  # (N, *S/2, 2^nd * C) phase-major (models.unet)
    phase_labels: jax.Array,  # (N, *S/2, 2^nd) int (space_to_depth of labels)
    *,
    include_background: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    apply_softmax: bool = True,
) -> jax.Array:
    """:func:`dice_loss` evaluated directly on subpixel phase-major logits.

    Dice sums are voxel-permutation-invariant, so
    ``dice_loss_phase(s2d(logits), s2d(labels)) == dice_loss(logits,
    labels)`` exactly — the training step uses this to consume the UNet's
    ``phase_logits`` output and skip the final depth-to-space plus the
    full-resolution logits materialization (models/unet.py phase stages).

    The production path (softmax + int labels) is a matmul-segmented
    formulation that never leaves the dense phase-lane layout: the
    per-voxel softmax normalizers are broadcast with two tiny MXU matmuls
    (``E @ G`` then ``@ G.T``) instead of keepdims-reduce + broadcast.
    Reshaping to an (N, *S/2, 2^nd, C) view and reducing over the C-minor
    axis — what autodiff or the plain :func:`dice_loss` VJP compiles to —
    makes XLA materialize the normalizer broadcasts at the full phase-
    expanded volume in f32 with a spatial lane layout plus relayout copies
    (~9 GB/step at 32x96^3x8, measured +74 ms on v5e; exp/dice_hlo.py).
    The matmul form measures +14 ms in-graph (exp/dice_cost5.py), exact to
    f32 rounding (test-pinned).
    """
    if apply_softmax and phase_labels.ndim == phase_logits.ndim and jnp.issubdtype(
        phase_labels.dtype, jnp.integer
    ):
        return _dice_phase_mm(
            phase_logits, phase_labels, include_background,
            float(smooth_nr), float(smooth_dr),
        )
    n_phase = phase_labels.shape[-1]
    num_classes = phase_logits.shape[-1] // n_phase
    # expose phases as an extra spatial axis: (N, *S/2, 2^nd, C)
    logits = phase_logits.reshape(phase_logits.shape[:-1] + (n_phase, num_classes))
    return dice_loss(
        logits, phase_labels,
        include_background=include_background,
        smooth_nr=smooth_nr, smooth_dr=smooth_dr, apply_softmax=apply_softmax,
    )


def _phase_geom(xp, yp):
    """The phase-group indicator matrix G (L x P), G[l, v] = 1 iff lane l
    belongs to phase-voxel v (lanes are phase-major: l = v * C + c). All
    arrays keep their native (N, *S/2, lanes) shape — flattening to 3-D
    made XLA materialize two 453 MB relayout copies in the backward
    (exp/hlo_cycles.py)."""
    lanes = xp.shape[-1]
    n_phase = yp.shape[-1]
    num_classes = lanes // n_phase
    g_mat = jnp.asarray(
        np.kron(np.eye(n_phase, dtype=np.float32),
                np.ones((num_classes, 1), np.float32))
    )
    # modulo before the narrow-dtype cast: lanes may exceed a u8 label's
    # range even though every class id fits
    lane_cls = (jnp.arange(lanes, dtype=jnp.int32) % num_classes).astype(
        yp.dtype
    )
    return n_phase, num_classes, g_mat, lane_cls


def _phase_probs(x, g_mat, m, dtype=jnp.float32):
    """Per-phase-voxel softmax over class lanes, normalizers broadcast by
    matmul. The max shift ``m`` is per 2^nd-voxel GROUP (exact softmax in
    real arithmetic; underflow only if logits within one 2x..x2
    neighborhood spread by >88 nats, guarded by the tiny clamp).

    ``dtype`` sets the storage width of the full-volume intermediates (the
    matmul accumulation stays f32): the backward pass stores them bf16
    when the logits are bf16 — the cotangent is quantized to bf16 at the
    boundary anyway, so the ~0.4% relative noise matches the output
    granularity while halving the bwd's HBM traffic."""
    # cast BEFORE the subtract: bf16 inputs read at bf16 traffic either
    # way, but the difference/exp compute at f32 precision
    e = jnp.exp(x.astype(jnp.float32) - m.astype(jnp.float32)).astype(dtype)
    z = jnp.maximum(
        jnp.einsum("...l,lv->...v", e, g_mat,
                   preferred_element_type=jnp.float32),
        jnp.finfo(jnp.float32).tiny,
    )
    zr = jnp.einsum("...v,vl->...l", 1.0 / z, g_mat.T,
                    preferred_element_type=jnp.float32)
    return e * zr.astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dice_phase_mm(xp, yp, include_background, smooth_nr, smooth_dr):
    loss, _ = _dice_phase_fwd(xp, yp, include_background, smooth_nr, smooth_dr)
    return loss


def _dice_phase_fwd(xp, yp, include_background, smooth_nr, smooth_dr):
    n_phase, num_classes, g_mat, lane_cls = _phase_geom(xp, yp)
    n = xp.shape[0]
    spatial = tuple(range(1, xp.ndim - 1))
    # softmax shift granularity (read at trace time). Exactness holds for
    # ANY shift that is constant within each phase-voxel group; "sample"
    # reduces to one scalar per sample (tiny broadcast + residual, widens
    # the underflow window from one 2x..x2 neighborhood to the whole
    # sample: garbage only if a group's lanes all sit >87 nats below the
    # sample max). MEASURED A WASH at the b96 production step (r5,
    # exp/dice_max_ab.py: group 360.70 ms vs sample 359.15 ms, 1.00x,
    # losses bit-identical 0.87503) — XLA fuses the lane-max into the
    # same pass either way; the HLO-ranked ~5 ms was cost-model
    # attribution, not removable wall time. Default stays "group"
    # (tightest underflow window); knob kept for bounded-logit heads.
    if os.environ.get("SEGMANTIC_DICE_MAX", "group") == "sample":
        m = jnp.max(xp, axis=tuple(range(1, xp.ndim)), keepdims=True)
    else:
        m = jnp.max(xp, axis=-1, keepdims=True)
    p = _phase_probs(xp, g_mat, m)
    onehot = jnp.repeat(yp, num_classes, axis=-1) == lane_cls

    def fold(a):  # (n, L) lane sums -> (n, C) class sums
        return a.reshape(n, n_phase, num_classes).sum(axis=1)

    inter = fold(jnp.sum(jnp.where(onehot, p, 0.0), axis=spatial))
    denom = fold(jnp.sum(p, axis=spatial)) + fold(
        jnp.sum(onehot.astype(jnp.float32), axis=spatial)
    )
    if not include_background:
        inter, denom = inter[:, 1:], denom[:, 1:]
    dice = (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    # m rides along (tiny: lanes/L of the logits) so the backward skips
    # the 453 MB reduce_max re-sweep
    return jnp.mean(1.0 - dice), (xp, yp, m, inter, denom)


def _dice_phase_bwd(include_background, smooth_nr, smooth_dr, res, g):
    xp, yp, m, inter, denom = res
    n_phase, num_classes, g_mat, lane_cls = _phase_geom(xp, yp)
    bshape = (xp.shape[0],) + (1,) * (xp.ndim - 2)
    inv = 1.0 / (denom + smooth_dr)
    scale = g / inter.size
    d_inter = -scale * 2.0 * inv
    d_denom = scale * (2.0 * inter + smooth_nr) * inv * inv
    if not include_background:
        d_inter = jnp.pad(d_inter, ((0, 0), (1, 0)))  # class 0: no gradient
        d_denom = jnp.pad(d_denom, ((0, 0), (1, 0)))
    # per-lane constants: lane l carries its class's d_inter / d_denom
    tile = jnp.tile(jnp.eye(num_classes, dtype=jnp.float32), (1, n_phase))
    di_l = (d_inter @ tile).reshape(bshape + (-1,))
    dd_l = (d_denom @ tile).reshape(bshape + (-1,))
    # bf16 logits -> bf16 full-volume intermediates (see _phase_probs)
    bdt = xp.dtype if xp.dtype == jnp.bfloat16 else jnp.float32
    p = _phase_probs(xp, g_mat, m, dtype=bdt)
    onehot = jnp.repeat(yp, num_classes, axis=-1) == lane_cls
    # hot/cold per-lane values summed in f32 FIRST (di and dd have
    # opposite signs — near-perfect dice would cancel catastrophically
    # at bf16), then one data-dependent select
    d_probs = jnp.where(
        onehot, (di_l + dd_l).astype(bdt), dd_l.astype(bdt)
    )
    inner = jnp.einsum(
        "...l,lv->...v", (p * d_probs).astype(bdt), g_mat,
        preferred_element_type=jnp.float32,
    )
    inner_l = jnp.einsum(
        "...v,vl->...l", inner, g_mat.T,
        preferred_element_type=jnp.float32,
    ).astype(bdt)
    d_x = (p * (d_probs - inner_l)).astype(xp.dtype)
    d_y = np.zeros(yp.shape, dtype=jax.dtypes.float0)
    return d_x, d_y


_dice_phase_mm.defvjp(_dice_phase_fwd, _dice_phase_bwd)


def dice_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    lambda_dice: float = 1.0,
    lambda_ce: float = 1.0,
) -> jax.Array:
    """Combined Dice + cross-entropy (common 3D-segmentation default)."""
    num_classes = logits.shape[-1]
    if labels.ndim == logits.ndim - 1:
        onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    else:
        onehot = labels.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
    return lambda_dice * dice_loss(logits, labels) + lambda_ce * ce
