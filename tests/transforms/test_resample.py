import numpy as np
import pytest

from segmantic_tpu.ops.resample import (
    grid_matrix,
    output_affine_for_spacing,
    resample_affine_jax,
    resample_affine_np,
)


def _random_matrix(rng, nd, scale=1.0):
    theta = rng.uniform(-0.4, 0.4)
    rot = np.eye(nd)
    rot[0, 0], rot[0, 1] = np.cos(theta), -np.sin(theta)
    rot[1, 0], rot[1, 1] = np.sin(theta), np.cos(theta)
    m = np.zeros((nd, nd + 1))
    m[:, :nd] = rot * scale
    m[:, nd] = rng.uniform(-1, 1, nd)
    return m


@pytest.mark.parametrize("order", [0, 1])
def test_identity_resample(order):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((2, 6, 7, 8)).astype(np.float32)
    m = np.eye(3, 4)
    out = resample_affine_np(data, m, (6, 7, 8), order=order)
    np.testing.assert_allclose(out, data, atol=1e-6)


@pytest.mark.parametrize("order", [0, 1])
def test_np_jax_agree_general(order):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((1, 9, 10, 11)).astype(np.float32)
    m = _random_matrix(rng, 3)
    out_np = resample_affine_np(data, m, (8, 8, 8), order=order)
    out_jax = np.asarray(
        resample_affine_jax(data, m.astype(np.float32), (8, 8, 8), order=order)
    )
    np.testing.assert_allclose(out_np, out_jax, atol=2e-4)


@pytest.mark.parametrize("order", [0, 1])
def test_np_jax_agree_diagonal(order):
    rng = np.random.default_rng(2)
    data = rng.standard_normal((1, 12, 13, 14)).astype(np.float32)
    m = np.diag([0.5, 1.5, 0.75]) @ np.eye(3, 4)
    m[:, 3] = [0.2, -0.3, 0.1]
    out_np = resample_affine_np(data, m, (20, 9, 17), order=order)
    out_jax = np.asarray(
        resample_affine_jax(data, m.astype(np.float32), (20, 9, 17), order=order)
    )
    np.testing.assert_allclose(out_np, out_jax, atol=2e-4)


def test_linear_interp_values():
    # 1D-like check: doubling resolution halves steps
    data = np.arange(4, dtype=np.float32).reshape(1, 4, 1, 1)
    m = np.zeros((3, 4))
    m[0, 0], m[1, 1], m[2, 2] = 0.5, 1.0, 1.0
    out = resample_affine_np(data, m, (7, 1, 1), order=1)
    np.testing.assert_allclose(out[0, :, 0, 0], [0, 0.5, 1, 1.5, 2, 2.5, 3])


def test_outside_is_cval():
    data = np.ones((1, 4, 4, 4), dtype=np.float32)
    m = np.eye(3, 4)
    m[:, 3] = 10.0  # everything out of bounds
    out = resample_affine_np(data, m, (4, 4, 4), order=1, cval=-7.0)
    assert np.all(out == -7.0)
    out_jax = np.asarray(
        resample_affine_jax(data, m.astype(np.float32), (4, 4, 4), order=1, cval=-7.0)
    )
    assert np.all(out_jax == -7.0)


def test_integer_labels_nearest():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 5, (1, 8, 8, 8)).astype(np.uint16)
    m = np.eye(3, 4)
    out = resample_affine_np(labels, m, (8, 8, 8), order=0)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, labels)


def test_output_affine_for_spacing():
    affine = np.diag([0.5, 0.6, 0.7, 1.0])
    out_aff, out_shape = output_affine_for_spacing(affine, (5, 5, 5), (0.25, 0.3, 0.35))
    assert out_shape == (10, 10, 10)
    np.testing.assert_allclose(np.diag(out_aff), [0.25, 0.3, 0.35, 1.0])
    m = grid_matrix(affine, out_aff, 3)
    np.testing.assert_allclose(m[:, :3], np.diag([0.5, 0.5, 0.5]), atol=1e-12)
