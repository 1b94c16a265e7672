"""Numeric equivalence of the space-to-depth conv rewrites vs lax convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.ops import fast_conv


def _dn(nd):
    sp = "DHW"[-nd:]
    return ("N" + sp + "C", sp + "IO", "N" + sp + "C")


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("nd,ci,co,sp", [(3, 1, 5, 8), (3, 3, 4, 12), (2, 1, 7, 16)])
def test_s2d_conv_matches_lax(nd, ci, co, sp):
    k1, k2 = jax.random.split(jax.random.key(0))
    x = _rand(k1, (2,) + (sp,) * nd + (ci,))
    w = _rand(k2, (3,) * nd + (ci, co))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(2,) * nd, padding="SAME",
        dimension_numbers=_dn(nd))
    got = fast_conv.s2d_conv(x, w)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nd,ci,co,sp", [(3, 4, 3, 8), (3, 2, 8, 10), (2, 3, 5, 14)])
def test_subpixel_conv_transpose_matches_lax(nd, ci, co, sp):
    k1, k2 = jax.random.split(jax.random.key(1))
    x = _rand(k1, (2,) + (sp,) * nd + (ci,))
    w = _rand(k2, (3,) * nd + (ci, co))
    ref = jax.lax.conv_transpose(
        x, w, strides=(2,) * nd, padding="SAME", dimension_numbers=_dn(nd))
    got = fast_conv.subpixel_conv_transpose(x, w)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nd,ci,co,sp", [(3, 2, 6, 8), (3, 8, 8, 10), (2, 1, 4, 12)])
def test_s2d_conv_s1_matches_lax(nd, ci, co, sp):
    k1, k2 = jax.random.split(jax.random.key(2))
    x = _rand(k1, (2,) + (sp,) * nd + (ci,))
    w = _rand(k2, (3,) * nd + (ci, co))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,) * nd, padding="SAME",
        dimension_numbers=_dn(nd))
    got = fast_conv.s2d_conv_s1(x, w)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bias_and_grads_flow():
    k1, k2 = jax.random.split(jax.random.key(3))
    x = _rand(k1, (1, 8, 8, 8, 2))
    w = _rand(k2, (3, 3, 3, 2, 4))
    b = jnp.arange(4, dtype=jnp.float32)

    def loss(fn):
        return lambda xx, ww: fn(xx, ww, b).sum()

    for fn in (fast_conv.s2d_conv, fast_conv.s2d_conv_s1,
               fast_conv.subpixel_conv_transpose):
        dx, dw = jax.grad(loss(fn), argnums=(0, 1))(x, w)
        assert dx.shape == x.shape and dw.shape == w.shape
        assert bool(jnp.isfinite(dx).all()) and bool(jnp.isfinite(dw).all())

    # gradient parity vs the lax formulation for the stride-1 rewrite
    def ref_loss(xx, ww):
        y = jax.lax.conv_general_dilated(
            xx, ww, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=_dn(3)) + b
        return (y ** 2).sum()

    def got_loss(xx, ww):
        return (fast_conv.s2d_conv_s1(xx, ww, b) ** 2).sum()

    rdx, rdw = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gdx, gdw = jax.grad(got_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gdx, rdx, rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(gdw, rdw, rtol=5e-3, atol=1e-3)


def test_eligibility_gates():
    assert fast_conv.s2d_eligible((8, 96, 96, 96, 1), (3, 3, 3), (2, 2, 2))
    assert not fast_conv.s2d_eligible((8, 96, 96, 96, 16), (3, 3, 3), (2, 2, 2))
    assert not fast_conv.s2d_eligible((8, 95, 96, 96, 1), (3, 3, 3), (2, 2, 2))
    assert fast_conv.s2d_s1_eligible((8, 96, 96, 96, 8), (3, 3, 3), (1, 1, 1))
    assert not fast_conv.s2d_s1_eligible((8, 48, 48, 48, 8), (3, 3, 3), (1, 1, 1))
    assert not fast_conv.s2d_s1_eligible((8, 96, 96, 96, 16), (3, 3, 3), (1, 1, 1))
    assert fast_conv.subpixel_eligible((8, 48, 48, 48, 32), 8, (3, 3, 3), (2, 2, 2))
    assert not fast_conv.subpixel_eligible((8, 6, 6, 6, 384), 64, (3, 3, 3), (2, 2, 2))


def test_phase_gemm_routing_dispatch(monkeypatch):
    """phase_conv_s1's SEGMANTIC_PHASE_GEMM dispatch (TPU-only in prod,
    pinned here with a faked backend + stubbed kernel entry points):
    on -> Pallas op; hybrid -> XLA-fwd/Pallas-bwd wrapper; auto -> Pallas
    below the measured grid-step crossover (or unfolded), hybrid above;
    off / unsupported shapes -> the XLA expanded-k3 conv."""
    from segmantic_tpu.ops import phase_gemm

    calls = []
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(phase_gemm, "phase_conv",
                        lambda p, w: calls.append("pallas") or "pallas")
    monkeypatch.setattr(fast_conv, "_phase_conv_hybrid",
                        lambda p, w: calls.append("hybrid") or "hybrid")
    monkeypatch.setattr(fast_conv, "_phase_conv_xla_k3",
                        lambda p, w: calls.append("xla") or "xla")

    w = jnp.zeros((3, 3, 3, 8, 8), jnp.bfloat16)
    small = jnp.zeros((1, 8, 8, 16, 64), jnp.bfloat16)      # folded, 8 steps
    unfolded = jnp.zeros((1, 8, 8, 8, 64), jnp.bfloat16)    # W%16!=0
    big = jnp.zeros((96, 48, 48, 48, 64), jnp.bfloat16)     # 4608 steps
    assert big.shape[0] * big.shape[1] > fast_conv._PHASE_GEMM_FWD_MAX_STEPS

    monkeypatch.setenv("SEGMANTIC_PHASE_GEMM", "on")
    assert fast_conv.phase_conv_s1(small, w) == "pallas"
    monkeypatch.setenv("SEGMANTIC_PHASE_GEMM", "hybrid")
    assert fast_conv.phase_conv_s1(small, w) == "hybrid"
    monkeypatch.setenv("SEGMANTIC_PHASE_GEMM", "auto")
    assert fast_conv.phase_conv_s1(small, w) == "pallas"
    assert fast_conv.phase_conv_s1(unfolded, w) == "pallas"
    assert fast_conv.phase_conv_s1(big, w) == "hybrid"
    monkeypatch.setenv("SEGMANTIC_PHASE_GEMM", "off")
    monkeypatch.setenv("SEGMANTIC_PHASE_K2", "off")
    assert fast_conv.phase_conv_s1(small, w) == "xla"
    # unsupported lane count falls back regardless of mode
    monkeypatch.setenv("SEGMANTIC_PHASE_GEMM", "on")
    bad = jnp.zeros((1, 8, 8, 16, 24), jnp.bfloat16)
    assert fast_conv.phase_conv_s1(bad, w) == "xla"
    # xdx dispatches before the TPU/shape gates (any backend, 3D only)
    monkeypatch.setattr(fast_conv, "_phase_conv_xdx",
                        lambda p, w: calls.append("xdx") or "xdx")
    monkeypatch.setenv("SEGMANTIC_PHASE_GEMM", "xdx")
    assert fast_conv.phase_conv_s1(small, w) == "xdx"
    assert fast_conv.phase_conv_s1(bad, w) == "xdx"


def test_xdx_custom_vjp_matches_autodiff():
    """fast_conv._phase_conv_xdx (XLA fwd; dp re-expressed as a forward
    conv on the flipped/io-swapped kernel, dw replaying XLA's own vjp)
    against jax.grad of the expanded-k3 conv — runs on CPU."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 12, 8, 16, 8)).astype(np.float32)
    w = (0.3 * rng.normal(size=(3, 3, 3, 8, 8))).astype(np.float32)
    p = fast_conv.space_to_depth(jnp.asarray(x))
    gcot = jnp.asarray(rng.normal(size=p.shape).astype(np.float32))

    def loss_ref(p, w):
        return jnp.sum(fast_conv._phase_conv_xla_k3(p, w) * gcot)

    def loss_xdx(p, w):
        return jnp.sum(fast_conv._phase_conv_xdx(p, w) * gcot)

    wj = jnp.asarray(w)
    np.testing.assert_allclose(
        np.asarray(fast_conv._phase_conv_xdx(p, wj)),
        np.asarray(fast_conv._phase_conv_xla_k3(p, wj)), rtol=1e-6)
    dp_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(p, wj)
    dp_got, dw_got = jax.grad(loss_xdx, argnums=(0, 1))(p, wj)
    np.testing.assert_allclose(np.asarray(dp_got), np.asarray(dp_ref),
                               atol=5e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               atol=5e-5, rtol=1e-5)
