"""Generate golden arrays pinning resample semantics against an INDEPENDENT
oracle (scipy.ndimage.map_coordinates), frozen into ``goldens.npz``.

The conventions pinned here are the reference's ITK semantics
(reference: src/segmantic/image/processing.py:49-120):

- resample-to-spacing geometry: same origin + direction, new spacing,
  ``out_size[d] = ceil(in_size[d] * in_spacing[d] / target[d])``
- voxel model: the value sits AT the index point; physical position of
  index i is ``origin + direction @ diag(spacing) @ i`` (nibabel affine)
- interpolation: (bi/tri)linear or nearest; outside the index hull the
  value fades to 0 (cval), matching scipy ``mode='constant', cval=0``
- resample-to-reference: output grid is the fixed image's affine+shape,
  identity physical transform

The oracle path here deliberately shares NO code with
``segmantic_tpu.ops.resample``: coordinates are computed with plain
``np.linalg.inv`` + einsum and interpolated by scipy. Regenerate with
``python tests/golden/make_goldens.py`` (writes goldens.npz next to it).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
from scipy import ndimage


def rot_z(deg: float) -> np.ndarray:
    c, s = math.cos(math.radians(deg)), math.sin(math.radians(deg))
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def build_affine(direction: np.ndarray, spacing, origin) -> np.ndarray:
    nd = len(spacing)
    aff = np.eye(4)
    aff[:nd, :nd] = np.asarray(direction)[:nd, :nd] * np.asarray(spacing)[None, :]
    aff[:nd, 3] = origin
    return aff


def itk_spacing_geometry(in_affine, in_shape, target):
    """ITK resample-to-spacing output geometry, computed independently."""
    nd = len(in_shape)
    lin = in_affine[:3, :nd]
    spacing = np.sqrt((lin**2).sum(axis=0))
    out_shape = tuple(
        int(math.ceil(in_shape[d] * spacing[d] / target[d])) for d in range(nd)
    )
    direction = lin / spacing[None, :]
    out = np.eye(4)
    out[:3, :nd] = direction * np.asarray(target, float)[None, :]
    out[:3, 3] = in_affine[:3, 3]
    return out, out_shape


def oracle_resample(data, in_affine, out_affine, out_shape, order):
    """channel-first resample via scipy.ndimage (the independent oracle).

    Returns (values, interior_mask, outside_mask). Values are only
    authoritative on ``interior_mask`` (source coords strictly within the
    index hull [0, n-1]) — edge-band fade conventions differ between
    implementations, so the band is excluded. ``outside_mask`` marks points
    a full voxel beyond the hull where every convention must produce 0.
    """
    nd = data.ndim - 1
    m = np.linalg.inv(in_affine) @ out_affine
    lin = m[:nd, :nd]
    off = m[:nd, 3]
    grids = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in out_shape],
                        indexing="ij")
    idx = np.stack(grids)  # (nd, *out_shape)
    coords = np.einsum("ij,j...->i...", lin, idx) + off.reshape((nd,) + (1,) * nd)
    in_shape = np.asarray(data.shape[1:], np.float64).reshape((nd,) + (1,) * nd)
    eps = 1e-6
    interior = np.all((coords >= eps) & (coords <= in_shape - 1 - eps), axis=0)
    outside = np.any((coords < -1.0) | (coords > in_shape), axis=0)
    out = np.stack([
        ndimage.map_coordinates(c, coords, order=order, mode="constant", cval=0.0)
        for c in data.astype(np.float64)
    ])
    return out.astype(np.float32), interior, outside


def main() -> None:
    rng = np.random.default_rng(42)
    store = {}

    # --- case A: 3D, rotated anisotropic grid, linear + nearest ------------
    data3 = rng.uniform(0, 10, (2, 7, 6, 5)).astype(np.float32)
    aff3 = build_affine(rot_z(30.0), (1.0, 1.5, 2.0), (3.0, -2.0, 1.0))
    target3 = (1.1, 0.9, 1.7)
    out_aff3, out_shape3 = itk_spacing_geometry(aff3, data3.shape[1:], target3)
    store["A_data"] = data3
    store["A_in_affine"] = aff3
    store["A_target"] = np.asarray(target3)
    store["A_out_affine"] = out_aff3
    store["A_out_shape"] = np.asarray(out_shape3)
    store["A_linear"], store["A_interior"], store["A_outside"] = oracle_resample(
        data3, aff3, out_aff3, out_shape3, 1)
    store["A_nearest"], _, _ = oracle_resample(data3, aff3, out_aff3, out_shape3, 0)

    # --- case B: 2D, negative-determinant direction (flip) -----------------
    data2 = rng.uniform(0, 10, (1, 9, 8)).astype(np.float32)
    dir2 = np.array([[-0.8, 0.6], [0.6, 0.8]])  # rotation * flip, det < 0
    aff2 = build_affine(dir2, (0.7, 1.3), (5.0, -1.0))
    target2 = (1.0, 1.0)
    out_aff2, out_shape2 = itk_spacing_geometry(aff2, data2.shape[1:], target2)
    store["B_data"] = data2
    store["B_in_affine"] = aff2
    store["B_target"] = np.asarray(target2)
    store["B_out_affine"] = out_aff2
    store["B_out_shape"] = np.asarray(out_shape2)
    store["B_linear"], store["B_interior"], store["B_outside"] = oracle_resample(
        data2, aff2, out_aff2, out_shape2, 1)

    # --- case C: nearest on integer labels, resample-to-reference ----------
    labels = rng.integers(0, 5, (1, 6, 6, 6)).astype(np.float32)
    aff_mov = build_affine(rot_z(-20.0), (1.3, 1.3, 0.9), (0.0, 0.0, 0.0))
    aff_fix = build_affine(np.eye(3), (1.05, 0.95, 1.15), (0.4, 0.3, -0.2))
    fix_shape = (7, 8, 5)
    store["C_labels"] = labels
    store["C_mov_affine"] = aff_mov
    store["C_fix_affine"] = aff_fix
    store["C_fix_shape"] = np.asarray(fix_shape)
    store["C_nearest"], store["C_interior"], store["C_outside"] = oracle_resample(
        labels, aff_mov, aff_fix, fix_shape, 0)

    out = Path(__file__).parent / "goldens.npz"
    np.savez_compressed(out, **store)
    print(f"wrote {out} ({out.stat().st_size} bytes, {len(store)} arrays)")


if __name__ == "__main__":
    main()
