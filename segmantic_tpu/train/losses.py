"""Segmentation losses (jittable, channel-last logits).

Dice loss semantics match the reference's configuration
``DiceLoss(to_onehot_y=True, softmax=True)``
(reference: src/segmantic/seg/monai_unet.py:128): softmax over channels,
one-hot targets, per-(batch, class) reduction over spatial dims with
smooth_nr = smooth_dr = 1e-5, mean over batch and classes, background
included.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    """
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


def dice_loss_phase(
    phase_logits: jax.Array,  # (N, *S/2, 2^nd * C) phase-major (models.unet)
    phase_labels: jax.Array,  # (N, *S/2, 2^nd) int (space_to_depth of labels)
    **kwargs,
) -> jax.Array:
    """:func:`dice_loss` evaluated directly on subpixel phase-major logits.

    Dice sums are voxel-permutation-invariant, so
    ``dice_loss_phase(s2d(logits), s2d(labels)) == dice_loss(logits,
    labels)`` exactly — the training step uses this to consume the UNet's
    ``phase_logits`` output and skip the final depth-to-space plus the
    full-resolution logits materialization (models/unet.py phase stages).
    """
    n_phase = phase_labels.shape[-1]
    num_classes = phase_logits.shape[-1] // n_phase
    # expose phases as an extra spatial axis: (N, *S/2, 2^nd, C)
    logits = phase_logits.reshape(phase_logits.shape[:-1] + (n_phase, num_classes))
    return dice_loss(logits, phase_labels, **kwargs)


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
