"""Surface / Hausdorff distance metrics on binary masks.

Same statistics surface as the reference's ITK-based implementation
(reference: src/segmantic/seg/evaluation.py:5-93): symmetric surface
distances via exact Euclidean distance transforms sampled at the masks'
contours, returning {'mean','median','std','max'}. The EDT backend is the
native C++ Maurer/Felzenszwalb implementation in ``native/`` when built
(``segmantic_tpu.metrics._edt_native``), with an exact scipy fallback.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
from scipy import ndimage


def _edt(mask: np.ndarray, spacing: Optional[Sequence[float]]) -> np.ndarray:
    """Distance from every voxel to the nearest nonzero voxel of ``mask``."""
    if not mask.any():
        return np.full(mask.shape, np.inf, dtype=np.float32)
    try:
        from .. import native

        return native.edt_distance_to_foreground(mask, spacing)
    except Exception:
        return ndimage.distance_transform_edt(~mask.astype(bool), sampling=spacing)


def binary_contour(mask: np.ndarray) -> np.ndarray:
    """Inner contour: foreground voxels with at least one background
    face-neighbor (like sitk.BinaryContour)."""
    mask = mask.astype(bool)
    eroded = ndimage.binary_erosion(
        mask, structure=ndimage.generate_binary_structure(mask.ndim, 1), border_value=0
    )
    return mask & ~eroded


def _stats(distances: np.ndarray) -> Dict[str, float]:
    if distances.size == 0:
        return {"mean": 0.0, "median": 0.0, "std": 0.0, "max": 0.0}
    distances = np.abs(distances)
    return {
        "mean": float(np.mean(distances)),
        "median": float(np.median(distances)),
        "std": float(np.std(distances)),
        "max": float(np.max(distances)),
    }


def hausdorff_surface_distance(
    y_pred: np.ndarray,
    y_ref: np.ndarray,
    spacing: Optional[Sequence[float]] = None,
) -> Dict[str, float]:
    """Symmetric surface-to-surface distance statistics between two masks."""
    pred = np.asarray(y_pred).squeeze().astype(bool)
    ref = np.asarray(y_ref).squeeze().astype(bool)
    pred_contour = binary_contour(pred)
    ref_contour = binary_contour(ref)

    dist_to_pred = _edt(pred_contour, spacing)
    dist_to_ref = _edt(ref_contour, spacing)

    ref2pred = dist_to_pred[ref_contour]
    pred2ref = dist_to_ref[pred_contour]
    return _stats(np.concatenate([ref2pred, pred2ref], axis=None))


def hausdorff_pointwise_distance(
    y_pred: np.ndarray,
    y_ref: np.ndarray,
    spacing: Optional[Sequence[float]] = None,
) -> Dict[str, float]:
    """Symmetric point-to-surface distances over all foreground voxels
    (voxels inside the other mask count as 0)."""
    pred = np.asarray(y_pred).squeeze().astype(bool)
    ref = np.asarray(y_ref).squeeze().astype(bool)

    dist_to_pred = _edt(pred, spacing)  # 0 inside pred
    dist_to_ref = _edt(ref, spacing)

    ref2pred = dist_to_pred[ref]
    pred2ref = dist_to_ref[pred]
    all_d = np.concatenate([ref2pred, pred2ref], axis=None)
    all_d = np.maximum(all_d, 0.0)
    return _stats(all_d)
