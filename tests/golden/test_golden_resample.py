"""Golden-value tests: resample semantics pinned against stored arrays from
an independent oracle (scipy.ndimage — see make_goldens.py) plus closed-form
multilinear checks that are exact for ANY correct trilinear implementation.

These give test teeth to the "bit-identical deterministic transforms"
north-star: direction matrices, anisotropic spacing, the ITK out-size
convention (reference: src/segmantic/image/processing.py:49-120), and the
numpy/jax/native backends all against the same frozen expectations.
"""

from pathlib import Path

import numpy as np
import pytest

from segmantic_tpu.ops.resample import (
    grid_matrix,
    output_affine_for_spacing,
    resample_affine_jax,
    resample_affine_np,
)

GOLD = np.load(Path(__file__).parent / "goldens.npz")


def _run_backends(data, matrix, out_shape, order):
    """All available resample backends; each yields (name, result)."""
    yield "np", resample_affine_np(data, matrix, out_shape, order=order)
    import jax

    yield "jax", np.asarray(
        jax.jit(
            lambda d: resample_affine_jax(d, matrix, tuple(out_shape), order=order)
        )(data)
    )
    from segmantic_tpu import native

    if native.available():
        yield "native", native.resample_affine(
            data.astype(np.float32), matrix, out_shape, order=order
        )


def _assert_matches_golden(got, want, interior, outside, name, atol=2e-4):
    """Authoritative on interior points; must be 0 fully outside the hull
    (the one-voxel edge band is implementation-defined fade and excluded)."""
    np.testing.assert_allclose(
        got[:, interior], want[:, interior], atol=atol, err_msg=name
    )
    np.testing.assert_allclose(
        got[:, outside], 0.0, atol=atol, err_msg=f"{name}: outside hull"
    )


@pytest.mark.parametrize("order,key", [(1, "A_linear"), (0, "A_nearest")])
def test_golden_3d_rotated_anisotropic(order, key):
    data = GOLD["A_data"]
    out_affine, out_shape = output_affine_for_spacing(
        GOLD["A_in_affine"], data.shape[1:], GOLD["A_target"]
    )
    np.testing.assert_allclose(out_affine, GOLD["A_out_affine"], atol=1e-12)
    assert tuple(out_shape) == tuple(GOLD["A_out_shape"])
    m = grid_matrix(GOLD["A_in_affine"], out_affine, 3)
    for name, got in _run_backends(data, m, out_shape, order):
        _assert_matches_golden(
            got, GOLD[key], GOLD["A_interior"], GOLD["A_outside"], name
        )


def test_golden_2d_negative_determinant():
    data = GOLD["B_data"]
    out_affine, out_shape = output_affine_for_spacing(
        GOLD["B_in_affine"], data.shape[1:], GOLD["B_target"]
    )
    np.testing.assert_allclose(out_affine, GOLD["B_out_affine"], atol=1e-12)
    assert tuple(out_shape) == tuple(GOLD["B_out_shape"])
    m = grid_matrix(GOLD["B_in_affine"], out_affine, 2)
    for name, got in _run_backends(data, m, out_shape, 1):
        _assert_matches_golden(
            got, GOLD["B_linear"], GOLD["B_interior"], GOLD["B_outside"], name
        )


def test_golden_labels_to_reference_grid():
    labels = GOLD["C_labels"]
    m = grid_matrix(GOLD["C_mov_affine"], GOLD["C_fix_affine"], 3)
    interior, outside = GOLD["C_interior"], GOLD["C_outside"]
    for name, got in _run_backends(labels, m, tuple(GOLD["C_fix_shape"]), 0):
        np.testing.assert_array_equal(
            got[:, interior], GOLD["C_nearest"][:, interior], err_msg=name
        )
        np.testing.assert_array_equal(got[:, outside], 0.0, err_msg=name)


def test_multilinear_closed_form_exact():
    """Trilinear interpolation reproduces multilinear functions exactly, so
    for f(i,j,k)=a+bi+cj+dk+e*ij the correct output is known in closed form
    at every in-bounds point — for any direction matrix."""
    import math

    c, s = math.cos(0.4), math.sin(0.4)
    direction = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    in_aff = np.eye(4)
    in_aff[:3, :3] = direction * np.array([1.0, 1.4, 0.8])[None, :]
    in_aff[:3, 3] = [1.0, 2.0, -3.0]

    shape = (9, 9, 9)
    ii, jj, kk = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shape],
                             indexing="ij")
    f = 2.0 + 0.3 * ii - 0.7 * jj + 1.1 * kk + 0.05 * ii * jj
    data = f[None].astype(np.float64)

    # output grid strictly inside the input hull (no boundary fade)
    out_aff = in_aff.copy()
    out_aff[:3, 3] += in_aff[:3, :3] @ np.array([1.3, 1.2, 1.1])
    out_shape = (5, 5, 5)
    m = grid_matrix(in_aff, out_aff, 3)

    oi, oj, ok = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in out_shape],
                             indexing="ij")
    src = np.einsum("ij,j...->i...", m[:, :3], np.stack([oi, oj, ok])) + m[:, 3].reshape(3, 1, 1, 1)
    expected = 2.0 + 0.3 * src[0] - 0.7 * src[1] + 1.1 * src[2] + 0.05 * src[0] * src[1]

    for name, got in _run_backends(data, m, out_shape, 1):
        np.testing.assert_allclose(got[0], expected, atol=1e-5, err_msg=name)


def test_out_size_convention_awkward_sizes():
    """ceil(size*spacing/target) for sizes/spacings that don't divide."""
    aff = np.eye(4)
    aff[0, 0], aff[1, 1], aff[2, 2] = 1.0, 1.5, 2.0
    _, shape = output_affine_for_spacing(aff, (7, 7, 7), (1.1, 0.9, 1.7))
    assert shape == (
        int(np.ceil(7 * 1.0 / 1.1)),
        int(np.ceil(7 * 1.5 / 0.9)),
        int(np.ceil(7 * 2.0 / 1.7)),
    ) == (7, 12, 9)
