"""Shear-decomposed rotation/zoom vs the exact affine gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.ops.resample import resample_affine_np
from segmantic_tpu.ops.shear_resample import (
    center_crop,
    rotate_pass,
    rotate_zoom_nn_gather,
    rotate_zoom_shear,
    rotation_matrix,
    scale_pass,
    shear_pass,
)


def _smooth_blob(shape, seed=0):
    rng = np.random.default_rng(seed)
    coords = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    x = np.zeros(shape)
    for _ in range(4):
        c = rng.uniform(-0.5, 0.5, len(shape))
        w = rng.uniform(0.2, 0.5)
        r2 = sum((g - ci) ** 2 for g, ci in zip(coords, c))
        x += np.exp(-r2 / w**2)
    return x[None].astype(np.float32)  # (1, *shape)


def test_identity_is_exact():
    x = _smooth_blob((20, 22, 24))
    out = rotate_zoom_shear(
        jnp.asarray(x), jnp.zeros(3), jnp.asarray(1.0), order=1
    )
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_shear_pass_shifts_rows():
    x = np.zeros((1, 9, 9), np.float32)
    x[0, 4, :] = 1.0  # a horizontal line at a=4
    out = np.asarray(shear_pass(jnp.asarray(x), 0, 1, jnp.asarray(1.0), order=0))
    # out(a, b) = in(a - s*(b - c)): line moves to a = 4 + (b - 4)
    for b in range(9):
        expected_a = 4 + (b - 4)
        if 0 <= expected_a < 9:
            assert out[0, expected_a, b] == 1.0, (b, expected_a)


def test_scale_pass_zoom_in_centers():
    x = np.zeros((1, 9, 9), np.float32)
    x[0, 4, 4] = 1.0
    out = np.asarray(scale_pass(jnp.asarray(x), 0, jnp.asarray(3.0), order=1))
    # content zoom: center voxel spreads, stays centered
    assert out[0, 4, 4] == pytest.approx(1.0, abs=1e-5)
    assert out[0].sum() > 1.0


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_rotation_matches_affine_gather(axis):
    shape = (32, 32, 32)
    x = _smooth_blob(shape, seed=axis)
    theta = 0.35

    got = np.asarray(
        rotate_pass(jnp.asarray(x), axis, jnp.asarray(theta), order=1)
    )

    # exact gather with the same content rotation: in = R^{-1} @ out (about center)
    from segmantic_tpu.train.augment import _rotation_matrix

    rot = np.asarray(_rotation_matrix(3, jnp.where(np.arange(3) == axis, theta, 0.0)))
    center = (np.asarray(shape) - 1) / 2
    m = np.zeros((3, 4))
    m[:, :3] = rot.T
    m[:, 3] = center - rot.T @ center
    want = resample_affine_np(x, m, shape, order=1)

    # interiors agree (shears interpolate thrice -> slightly smoother)
    core = (slice(0, 1),) + (slice(8, 24),) * 3
    err = np.abs(got[core] - want[core]).max()
    assert err < 0.06, err
    corr = np.corrcoef(got[core].ravel(), want[core].ravel())[0, 1]
    assert corr > 0.995, corr


def test_rotation_labels_preserve_values():
    lbl = np.zeros((1, 24, 24, 24), np.int32)
    lbl[0, 8:16, 8:16, 8:16] = 2
    out = np.asarray(
        rotate_zoom_shear(jnp.asarray(lbl), jnp.asarray([0.3, 0.0, 0.0]), jnp.asarray(1.1), order=0)
    )
    assert set(np.unique(out)) <= {0, 2}
    assert (out == 2).sum() > 0


def test_zoom_matches_affine_gather():
    shape = (24, 24, 24)
    x = _smooth_blob(shape, seed=7)
    z = 1.25
    got = np.asarray(
        rotate_zoom_shear(jnp.asarray(x), jnp.zeros(3), jnp.asarray(z), order=1)
    )
    center = (np.asarray(shape) - 1) / 2
    m = np.zeros((3, 4))
    for a in range(3):
        m[a, a] = 1 / z
        m[a, 3] = center[a] - center[a] / z
    want = resample_affine_np(x, m, shape, order=1)
    core = (slice(0, 1),) + (slice(6, 18),) * 3
    np.testing.assert_allclose(got[core], want[core], atol=0.03)


def test_center_crop():
    x = jnp.arange(1 * 6 * 6).reshape(1, 6, 6)
    out = center_crop(x, (4, 4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[:, 1:5, 1:5]))

def test_extent_shrink_matches_full_frame():
    """out_shape-scheduled passes == full-frame computation + center crop.

    Center-aligned same-parity windows keep every pass's coordinate math
    identical, so the shrunk pipeline must be exact (not just close) for
    both the f32 image path and the integer label path."""
    from segmantic_tpu.ops.shear_resample import center_crop

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((2, 40, 44, 36)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, 7, (1, 40, 44, 36)).astype(np.int32))
    angles = jnp.asarray([0.31, -0.4, 0.22], jnp.float32)
    zoom = jnp.asarray(0.85, jnp.float32)
    out_shape = (24, 26, 22)

    for x, order, exact in ((img, 1, False), (lbl, 0, True)):
        full = center_crop(
            rotate_zoom_shear(x, angles, zoom, order=order), out_shape
        )
        shrunk = center_crop(
            rotate_zoom_shear(
                x, angles, zoom, order=order, out_shape=out_shape,
                angle_max=0.4, zoom_min=0.8,
            ),
            out_shape,
        )
        if exact:
            # one nonzero product per output row: fma grouping cannot
            # perturb it, so the label path is bit-identical
            np.testing.assert_array_equal(np.asarray(shrunk), np.asarray(full))
        else:
            # GEMMs of different shapes group fma partial sums differently
            # (~1-2 ulp); content must match to float precision
            np.testing.assert_allclose(
                np.asarray(shrunk), np.asarray(full), atol=1e-5, rtol=1e-5
            )


def test_extent_shrink_bf16_close():
    """bf16 image interp stays within bf16 tolerance of the f32 path."""
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 32)).astype(np.float32))
    angles = jnp.asarray([0.2, 0.1, -0.3], jnp.float32)
    zoom = jnp.asarray(1.1, jnp.float32)
    a = rotate_zoom_shear(img, angles, zoom, order=1, out_shape=(16, 16, 16),
                          angle_max=0.4, zoom_min=0.8)
    b = rotate_zoom_shear(img, angles, zoom, order=1, out_shape=(16, 16, 16),
                          angle_max=0.4, zoom_min=0.8, bf16=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.15)
    assert float(jnp.abs(a - b).mean()) < 0.02


def test_u8_label_chain_matches_int32():
    """The u8 NN chain (single deferred restore, bf16 between passes) is
    bit-identical to the per-pass-restored int32 chain."""
    rng = np.random.default_rng(9)
    lbl = rng.integers(0, 255, (1, 20, 20, 20), np.uint8)
    angles = jnp.asarray([0.21, -0.13, 0.07])
    zoom = jnp.asarray(1.12)
    out8 = rotate_zoom_shear(
        jnp.asarray(lbl), angles, zoom, order=0, out_shape=(12, 12, 12),
        angle_max=0.3, zoom_min=1.0,
    )
    out32 = rotate_zoom_shear(
        jnp.asarray(lbl, jnp.int32), angles, zoom, order=0,
        out_shape=(12, 12, 12), angle_max=0.3, zoom_min=1.0,
    )
    assert out8.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(out8, np.int32), np.asarray(out32)
    )


def test_rotation_zoom_matches_affine_gather():
    """The full chain (3 rotations THEN isotropic zoom, about the center)
    equals the ideal affine gather: in = Rot.T @ (out - c) / z + c. Guards
    the zoom-fold algebra (zoom folded into the last shear per axis)."""
    from segmantic_tpu.train.augment import _rotation_matrix

    shape = (32, 32, 32)
    x = _smooth_blob(shape, seed=11)
    angles = np.asarray([0.3, -0.22, 0.15], np.float32)
    z = 1.2
    got = np.asarray(
        rotate_zoom_shear(
            jnp.asarray(x), jnp.asarray(angles), jnp.asarray(z), order=1
        )
    )
    rot = np.asarray(_rotation_matrix(3, jnp.asarray(angles)))
    center = (np.asarray(shape) - 1) / 2
    m = np.zeros((3, 4))
    m[:, :3] = rot.T / z
    m[:, 3] = center - rot.T @ center / z
    want = resample_affine_np(x, m, shape, order=1)
    core = (slice(0, 1),) + (slice(8, 24),) * 3
    # 9 interpolating passes smooth slightly more than one gather
    err = np.abs(got[core] - want[core]).max()
    assert err < 0.15, err
    corr = np.corrcoef(got[core].ravel(), want[core].ravel())[0, 1]
    assert corr > 0.995, corr


def _nn_oracle_matrix(in_shape, out_shape, angles, z):
    """in = rot.T @ (out_local + window_offset - c)/z + c as an (nd, nd+1)
    matrix for resample_affine_np."""
    nd = len(in_shape)
    rot = np.asarray(rotation_matrix(nd, jnp.asarray(angles)), np.float64)
    c = (np.asarray(in_shape, np.float64) - 1) / 2
    off = np.asarray(
        [(n - m) // 2 for n, m in zip(in_shape, out_shape)], np.float64
    )
    m = np.zeros((nd, nd + 1))
    m[:, :nd] = rot.T / z
    m[:, nd] = rot.T @ (off - c) / z + c
    return m


def test_nn_gather_matches_affine_oracle():
    """rotate_zoom_nn_gather == the independent numpy affine resample
    (order 0) — exact, including the center-window offset and the
    outside-grid zero fill."""
    rng = np.random.default_rng(12)
    in_shape, out_shape = (24, 20, 22), (12, 12, 12)
    lbl = rng.integers(0, 7, (1,) + in_shape).astype(np.uint8)
    angles = np.asarray([0.31, -0.18, 0.24], np.float32)
    z = 1.17
    got = np.asarray(
        rotate_zoom_nn_gather(
            jnp.asarray(lbl), jnp.asarray(angles), jnp.asarray(z), out_shape
        )
    )
    want = resample_affine_np(
        lbl, _nn_oracle_matrix(in_shape, out_shape, angles, z), out_shape,
        order=0,
    )
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_nn_gather_identity_is_center_crop():
    rng = np.random.default_rng(13)
    lbl = rng.integers(0, 9, (1, 16, 16, 16)).astype(np.uint8)
    got = rotate_zoom_nn_gather(
        jnp.asarray(lbl), jnp.zeros(3), jnp.asarray(1.0), (8, 8, 8)
    )
    np.testing.assert_array_equal(
        np.asarray(got), lbl[:, 4:12, 4:12, 4:12]
    )


def test_nn_gather_close_to_shear_chain():
    """The single-rounding gather and the per-pass-rounding chain differ
    only where the chain's accumulated ~1-voxel rounding drift crosses a
    class boundary: on a structured label map the mismatch is a small
    boundary fraction (random labels would amplify every index flip)."""
    g = np.mgrid[0:32, 0:32, 0:32].astype(np.float32) - 15.5
    lbl = ((g[0] / 10) ** 2 + (g[1] / 7) ** 2 + (g[2] / 12) ** 2 < 1).astype(
        np.uint8
    )
    lbl += 2 * (
        ((g[0] + 4) / 5) ** 2 + (g[1] / 4) ** 2 + (g[2] / 6) ** 2 < 1
    ).astype(np.uint8)
    angles = jnp.asarray([0.2, -0.25, 0.12])
    z = jnp.asarray(1.1)
    direct = np.asarray(
        rotate_zoom_nn_gather(jnp.asarray(lbl[None]), angles, z, (20, 20, 20))
    )
    chain = np.asarray(center_crop(
        rotate_zoom_shear(
            jnp.asarray(lbl[None]), angles, z, order=0, out_shape=(20, 20, 20),
            angle_max=0.3, zoom_min=1.0,
        ), (20, 20, 20),
    ))
    frac = (direct != chain).mean()
    assert frac < 0.15, frac  # measured 0.081 — boundary voxels only
    assert set(np.unique(direct)) <= set(np.unique(lbl))
