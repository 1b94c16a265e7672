"""Anatomical orientation utilities (axis codes, reorientation to RAS).

Replaces MONAI's ``Orientationd(axcodes="RAS")`` step of the preprocessing
chain (reference: src/segmantic/seg/monai_unet.py:163) with explicit
permute+flip derived from the affine. Pure numpy on host metadata; the
actual data movement (transpose/flip) is cheap and XLA-fusable when applied
on device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_AXIS_LABELS = (("L", "R"), ("P", "A"), ("I", "S"))  # negative, positive per RAS axis


def io_orientation(affine: np.ndarray, ndim: int = 3) -> np.ndarray:
    """For each voxel axis, the closest physical axis and its sign.

    Returns an (ndim, 2) array of (physical_axis, sign) rows, computed by
    greedy assignment of the strongest remaining |direction cosine|.
    """
    rot = np.asarray(affine, dtype=np.float64)[:3, :ndim].copy()
    norms = np.linalg.norm(rot, axis=0)
    norms = np.where(norms == 0, 1.0, norms)
    cosines = rot / norms[None, :]

    result = np.zeros((ndim, 2), dtype=np.int64)
    remaining_vox = list(range(ndim))
    remaining_phys = list(range(3))
    # greedy: repeatedly take the largest |cosine| among remaining pairs
    while remaining_vox:
        best = None
        for v in remaining_vox:
            for p in remaining_phys:
                mag = abs(cosines[p, v])
                if best is None or mag > best[0]:
                    best = (mag, v, p)
        _, v, p = best
        result[v, 0] = p
        result[v, 1] = 1 if cosines[p, v] >= 0 else -1
        remaining_vox.remove(v)
        remaining_phys.remove(p)
    return result


def axcodes(affine: np.ndarray, ndim: int = 3) -> Tuple[str, ...]:
    """Axis codes like ('R','A','S') for each voxel axis."""
    orn = io_orientation(affine, ndim)
    return tuple(
        _AXIS_LABELS[int(p)][1 if s > 0 else 0] for p, s in orn
    )


def reorient_arrays_to_ras(
    data: np.ndarray, affine: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Reorient a channel-first array + affine so axis codes become RAS.

    Works for 3 spatial dims (2D volumes are already plane-aligned and pass
    through unchanged). Returns (new_data, new_affine).
    """
    ndim = data.ndim - 1
    if ndim != 3:
        return data, affine

    orn = io_orientation(affine, ndim)

    # 1) flip voxel axes with negative direction
    flips = [int(v) + 1 for v, (p, s) in enumerate(orn) if s < 0]  # +1 for channel
    new_data = np.flip(data, axis=flips) if flips else data

    # affine update for flips: index i -> (n-1) - i on flipped axes
    aff = np.asarray(affine, dtype=np.float64).copy()
    for ax in flips:
        v = ax - 1
        n = data.shape[ax]
        aff[:3, 3] = aff[:3, 3] + aff[:3, v] * (n - 1)
        aff[:3, v] = -aff[:3, v]

    # 2) permute voxel axes so voxel axis i maps to physical axis i
    perm = [int(np.where(orn[:, 0] == p)[0][0]) for p in range(ndim)]
    if perm != list(range(ndim)):
        new_data = np.transpose(new_data, axes=[0] + [p + 1 for p in perm])
        new_aff = np.eye(4, dtype=np.float64)
        new_aff[:3, :3] = aff[:3, perm]
        new_aff[:3, 3] = aff[:3, 3]
        aff = new_aff

    return np.ascontiguousarray(new_data), aff


def inverse_orientation_op(
    data: np.ndarray, affine: np.ndarray, original_affine: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Undo :func:`reorient_arrays_to_ras`: map a RAS-oriented array back to
    the voxel axis order/signs of ``original_affine``."""
    ndim = data.ndim - 1
    if ndim != 3:
        return data, affine
    orn = io_orientation(original_affine, ndim)
    # forward did: flip negatives, then permute so axis i -> physical i.
    # inverse: inverse-permute, then flip the same voxel axes.
    perm = [int(np.where(orn[:, 0] == p)[0][0]) for p in range(ndim)]
    # forward transpose satisfied new_axis[i] = old_axis[perm[i]]; undo via argsort
    inv_perm = list(np.argsort(perm))
    out = (
        np.transpose(data, axes=[0] + [inv_perm[p] + 1 for p in range(ndim)])
        if perm != list(range(ndim))
        else data
    )
    flips = [int(v) + 1 for v, (p, s) in enumerate(orn) if s < 0]
    if flips:
        out = np.flip(out, axis=flips)
    return np.ascontiguousarray(out), np.asarray(original_affine, dtype=np.float64)
