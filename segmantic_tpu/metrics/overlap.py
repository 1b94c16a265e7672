"""Overlap metrics: confusion matrix, Dice, sensitivity/specificity/etc.

XLA-native replacements for the reference's numba-JIT confusion-matrix
kernel (reference: src/segmantic/seg/evaluation.py:96-125) and MONAI's
DiceMetric / ConfusionMatrixMetric (reference:
src/segmantic/seg/monai_unet.py:135-139,641-647): one fused
``bincount`` over joint indices gives the full KxK matrix in a single pass.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(num_classes: int, target: jax.Array, prediction: jax.Array):
    """KxK confusion matrix (rows = target, cols = prediction).

    Accepts jnp or np integer arrays of equal shape; returns (K, K) int64 on
    the caller's backend.
    """
    if isinstance(target, np.ndarray):
        joint = target.astype(np.int64).ravel() * num_classes + prediction.astype(
            np.int64
        ).ravel()
        counts = np.bincount(joint, minlength=num_classes * num_classes)
        return counts.reshape(num_classes, num_classes)
    joint = target.astype(jnp.int32).ravel() * num_classes + prediction.astype(
        jnp.int32
    ).ravel()
    counts = jnp.bincount(joint, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def dice_from_confusion(cm) -> np.ndarray:
    """Per-class Dice from a confusion matrix (nan-safe → 0)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        dice = 2 * tp / denom
    return np.where(denom > 0, dice, 0.0)


def dice_metric(
    prediction: jax.Array,
    target: jax.Array,
    num_classes: int,
    include_background: bool = False,
) -> jax.Array:
    """Mean Dice over classes for one case (discrete label maps).

    Matches MONAI ``DiceMetric(include_background=False)`` semantics used for
    validation (reference: src/segmantic/seg/monai_unet.py:135-139).
    """
    cm = confusion_matrix(num_classes, target, prediction)
    cm = jnp.asarray(cm, jnp.float32)
    tp = jnp.diag(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1)
    dice = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1), jnp.nan)
    if not include_background:
        dice = dice[1:]
    return jnp.nanmean(dice)


def confusion_matrix_metrics(cm) -> Dict[str, np.ndarray]:
    """Per-class sensitivity / specificity / precision / accuracy from a
    KxK confusion matrix (the metric set the reference reports per case)."""
    cm = np.asarray(cm, np.float64)
    total = cm.sum()
    tp = np.diag(cm)
    fn = cm.sum(axis=1) - tp
    fp = cm.sum(axis=0) - tp
    tn = total - tp - fn - fp

    def safe(n, d):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = n / d
        return np.where(d > 0, r, 0.0)

    return {
        "sensitivity": safe(tp, tp + fn),
        "specificity": safe(tn, tn + fp),
        "precision": safe(tp, tp + fp),
        "accuracy": safe(tp + tn, total),
        "dice": safe(2 * tp, 2 * tp + fp + fn),
    }
