"""Pallas implicit-GEMM phase conv vs the expanded-k3 XLA reference
(interpret mode — runs on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.ops import fast_conv as fc
from segmantic_tpu.ops import phase_gemm as pg


def _ref(p, w):
    nd = p.ndim - 2
    ws = fc.expand_s1_kernel(w)
    return jax.lax.conv_general_dilated(
        p, ws, (1,) * nd, ((1, 1),) * nd,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize(
    "shape,c,folded",
    [
        ((2, 6, 4, 16), 8, True),   # W=16 -> WF=8: folded path
        ((1, 4, 6, 8), 8, False),   # W=8: unfolded L=64
        ((1, 4, 4, 8), 16, False),  # L=128: unfolded
    ],
)
def test_phase_conv_gemm_matches_expanded_conv(shape, c, folded):
    rng = np.random.default_rng(0)
    b, d, h, w_sp = shape
    x = rng.normal(size=(b, 2 * d, 2 * h, 2 * w_sp, c)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, c, c)).astype(np.float32)
    p = fc.space_to_depth(jnp.asarray(x))
    assert pg._fold_ok(p.shape) == folded
    ref = _ref(p, jnp.asarray(w))
    got = pg.phase_conv_gemm(p, jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "shape,c",
    [
        ((2, 6, 4, 16), 8),   # folded path (L=64, W%16==0)
        ((1, 4, 6, 8), 8),    # unfolded L=64
        ((1, 4, 4, 8), 16),   # unfolded L=128
    ],
)
def test_phase_conv_custom_vjp_matches_autodiff(shape, c):
    """dx (fwd kernel with flipped/io-swapped weights) and dw (transposed
    implicit-GEMM kernels + expansion adjoint) against jax.grad of the
    expanded-k3 conv."""
    rng = np.random.default_rng(2)
    b, d, h, w_sp = shape
    x = rng.normal(size=(b, 2 * d, 2 * h, 2 * w_sp, c)).astype(np.float32)
    w = (0.3 * rng.normal(size=(3, 3, 3, c, c))).astype(np.float32)
    p = fc.space_to_depth(jnp.asarray(x))
    gcot = jnp.asarray(
        rng.normal(size=p.shape).astype(np.float32))

    def loss_ref(p, w):
        return jnp.sum(_ref(p, w) * gcot)

    def loss_pg(p, w):
        return jnp.sum(pg.phase_conv(p, w, True) * gcot)

    dp_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(p, jnp.asarray(w))
    dp_got, dw_got = jax.grad(loss_pg, argnums=(0, 1))(p, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(dp_got), np.asarray(dp_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               atol=5e-3, rtol=1e-4)


def test_fold_weights_carry_exactly_the_true_macs():
    """The folded weight blocks hold each true-window MAC exactly once."""
    rng = np.random.default_rng(1)
    w2 = jnp.asarray(rng.normal(size=(2, 2, 2, 64, 64)).astype(np.float32))
    w3 = pg.fold_weights_w3(w2)
    assert w3.shape == (2, 2, 2, 128, 128)
    # total L1 mass is preserved: every k2 weight lands in exactly one slot
    np.testing.assert_allclose(
        float(jnp.sum(jnp.abs(w3))), 2 * float(jnp.sum(jnp.abs(w2))),
        rtol=1e-6)


def test_supported_accounts_for_dtype():
    """The VMEM eligibility estimate scales with element size: the bf16
    production shapes stay eligible, while f32 at the d0 grid (which would
    need ~2x the kernel scratch) falls back to the XLA conv."""
    assert pg.supported((96, 48, 48, 48, 64), jnp.bfloat16)
    assert pg.supported((96, 24, 24, 24, 128), jnp.bfloat16)
    assert not pg.supported((96, 48, 48, 48, 64), jnp.float32)
    assert pg.supported((96, 24, 24, 24, 128), jnp.float32)


def test_hybrid_custom_vjp_matches_autodiff(monkeypatch):
    """fast_conv._phase_conv_hybrid (XLA forward, Pallas implicit-GEMM
    backward — the large-grid production route) against jax.grad of the
    expanded-k3 conv, with the Pallas kernels in interpret mode."""
    from segmantic_tpu.ops import phase_gemm

    real_gemm, real_dw = pg.phase_conv_gemm, pg.phase_conv_gemm_dw
    monkeypatch.setattr(
        phase_gemm, "phase_conv_gemm",
        lambda p, w, interpret=False: real_gemm(p, w, True))
    monkeypatch.setattr(
        phase_gemm, "phase_conv_gemm_dw",
        lambda p, g, w, interpret=False: real_dw(p, g, w, True))

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 12, 8, 16, 8)).astype(np.float32)
    w = (0.3 * rng.normal(size=(3, 3, 3, 8, 8))).astype(np.float32)
    p = fc.space_to_depth(jnp.asarray(x))
    gcot = jnp.asarray(rng.normal(size=p.shape).astype(np.float32))

    def loss_ref(p, w):
        return jnp.sum(_ref(p, w) * gcot)

    def loss_hy(p, w):
        return jnp.sum(fc._phase_conv_hybrid(p, w) * gcot)

    # forward identical (it IS the XLA conv)
    np.testing.assert_allclose(
        np.asarray(fc._phase_conv_hybrid(p, jnp.asarray(w))),
        np.asarray(_ref(p, jnp.asarray(w))), atol=1e-5, rtol=1e-5)
    dp_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(p, jnp.asarray(w))
    dp_got, dw_got = jax.grad(loss_hy, argnums=(0, 1))(p, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(dp_got), np.asarray(dp_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               atol=5e-3, rtol=1e-4)
