"""Pallas streaming dice — NEGATIVE RESULT, kept as evidence.

The kernels below compile and match the XLA path numerically
(loss diff 7e-7, dx exact to fp), but measure ~4x SLOWER at the
flagship batch-96 phase shapes (fwd 42.4 vs 11.2 ms, bwd 63.4 vs
21.8 ms): the 8 per-phase small dots ((R,64)@(64,8) / (1,R)@(R,64))
at 64-lane blocks cannot compete with XLA's fused wide dots — the same
lesson as the packed phase-conv attempt (ROUND_NOTES: "don't pallas
what XLA runs dense"). Run: python exp/pallas_dice_ab.py [B]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def eligible(xp_shape, yp_shape) -> bool:
    """Flagship-geometry gate: 3D phase tensors whose row count divides
    into whole blocks (fallback: the XLA path)."""
    n_phase = yp_shape[-1]
    lanes = xp_shape[-1]
    if n_phase != 8 or lanes > 128 or lanes % n_phase:
        return False
    v = int(np.prod(xp_shape[1:-1]))
    if v % n_phase:
        return False
    return _rows_per_block(v // n_phase) is not None


def _rows_per_block(nrows: int):
    for r in (512, 384, 256, 216, 192, 128, 96, 64, 32, 16, 8):
        if nrows % r == 0:
            return r
    return None


def _indicator_mats(n_phase: int, num_classes: int):
    """G (L x P) and its transpose built from iota in-kernel (pallas
    kernels cannot capture array constants)."""
    lanes = n_phase * num_classes
    li = jax.lax.broadcasted_iota(jnp.int32, (lanes, n_phase), 0)
    vi = jax.lax.broadcasted_iota(jnp.int32, (lanes, n_phase), 1)
    gm = (li // num_classes == vi).astype(jnp.float32)
    pi = jax.lax.broadcasted_iota(jnp.int32, (n_phase, lanes), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (n_phase, lanes), 1)
    repm = (pi == lj // num_classes).astype(jnp.float32)
    return gm, repm


def _fwd_kernel(x_ref, y_ref, inter_ref, sump_ref, cnt_ref, *, n_phase,
                num_classes):
    lanes = n_phase * num_classes
    gm, repm = _indicator_mats(n_phase, num_classes)
    lane_cls = (
        jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[1], lanes), 1)
        % num_classes
    ).astype(jnp.float32)
    acc_i = jnp.zeros((1, lanes), jnp.float32)
    acc_p = jnp.zeros((1, lanes), jnp.float32)
    acc_c = jnp.zeros((1, lanes), jnp.float32)
    # row sums as (1,R)@(R,L) dots: Mosaic's sublane multi_reduction to a
    # 1-D vector fails to lower, and the MXU does this for free anyway
    ones_row = jnp.ones((1, x_ref.shape[1]), jnp.float32)
    for j in range(n_phase):
        xf = x_ref[0, :, j, :].astype(jnp.float32)  # (R, L)
        yj = y_ref[0, :, j * n_phase:(j + 1) * n_phase]  # (R, P) bf16 ids
        m = jnp.max(xf, axis=1, keepdims=True)
        e = jnp.exp(xf - m)
        z = jnp.maximum(
            jax.lax.dot(e, gm), jnp.finfo(jnp.float32).tiny
        )  # (R, P)
        zr = jax.lax.dot(1.0 / z, repm)  # (R, L)
        p = e * zr
        yrep = jax.lax.dot(yj.astype(jnp.float32), repm)  # label per lane
        oh = yrep == lane_cls
        acc_i += jax.lax.dot(ones_row, jnp.where(oh, p, 0.0))
        acc_p += jax.lax.dot(ones_row, p)
        acc_c += jax.lax.dot(ones_row, oh.astype(jnp.float32))
    inter_ref[0, 0] = acc_i
    sump_ref[0, 0] = acc_p
    cnt_ref[0, 0] = acc_c


def dice_phase_sums(xp: jax.Array, yp: jax.Array, *, interpret: bool = False):
    """Per-(batch, class) (intersection, prob-sum, count) of the
    phase-major softmax dice — matches `_dice_phase_fwd`'s folded sums up
    to f32 partial-sum order. xp (B, *S/2, L) float; yp (B, *S/2, P) int.
    """
    n = xp.shape[0]
    n_phase = yp.shape[-1]
    num_classes = xp.shape[-1] // n_phase
    lanes = n_phase * num_classes
    v = int(np.prod(xp.shape[1:-1]))
    nrows = v // n_phase
    r = _rows_per_block(nrows)
    nblk = nrows // r

    x4 = xp.reshape(n, nrows, n_phase, lanes)
    # pack P label rows into dense lanes (one small relayout)
    yb = yp.reshape(n, nrows, n_phase * n_phase).astype(jnp.bfloat16)

    kern = functools.partial(
        _fwd_kernel, n_phase=n_phase, num_classes=num_classes,
    )
    inter, sump, cnt = pl.pallas_call(
        kern,
        grid=(n, nblk),
        in_specs=[
            pl.BlockSpec((1, r, n_phase, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, r, n_phase * n_phase), lambda b, i: (b, i, 0)),
        ],
        # trailing block dims must divide (8, 128) or equal the array
        # dims — a singleton third axis satisfies the sublane rule
        out_specs=[
            pl.BlockSpec((1, 1, 1, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, lanes), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nblk, 1, lanes), jnp.float32)
            for _ in range(3)
        ],
        interpret=interpret,
    )(x4, yb)

    def fold(a):  # (n, nblk, 1, L) -> (n, C)
        return a.sum(axis=(1, 2)).reshape(n, n_phase, num_classes).sum(axis=1)

    return fold(inter), fold(sump), fold(cnt)


def _bwd_kernel(x_ref, y_ref, hot_ref, cold_ref, dx_ref, *, n_phase,
                num_classes):
    lanes = n_phase * num_classes
    gm, repm = _indicator_mats(n_phase, num_classes)
    lane_cls = (
        jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[1], lanes), 1)
        % num_classes
    ).astype(jnp.float32)
    hot = hot_ref[0]   # (1, L)
    cold = cold_ref[0]
    for j in range(n_phase):
        xf = x_ref[0, :, j, :].astype(jnp.float32)
        yj = y_ref[0, :, j * n_phase:(j + 1) * n_phase]
        m = jnp.max(xf, axis=1, keepdims=True)
        e = jnp.exp(xf - m)
        z = jnp.maximum(jax.lax.dot(e, gm), jnp.finfo(jnp.float32).tiny)
        zr = jax.lax.dot(1.0 / z, repm)
        p = e * zr
        yrep = jax.lax.dot(yj.astype(jnp.float32), repm)
        oh = yrep == lane_cls
        d_probs = jnp.where(oh, hot, cold)
        inner = jax.lax.dot(jax.lax.dot(p * d_probs, gm), repm)
        dx_ref[0, :, j, :] = (p * (d_probs - inner)).astype(dx_ref.dtype)


def dice_phase_dx(xp: jax.Array, yp: jax.Array, hot: jax.Array,
                  cold: jax.Array, *, interpret: bool = False) -> jax.Array:
    """The dice cotangent d_logits: per-lane hot/cold values (B, L) f32
    select by the one-hot, softmax-VJP'd — matches `_dice_phase_bwd`."""
    n = xp.shape[0]
    n_phase = yp.shape[-1]
    num_classes = xp.shape[-1] // n_phase
    lanes = n_phase * num_classes
    v = int(np.prod(xp.shape[1:-1]))
    nrows = v // n_phase
    r = _rows_per_block(nrows)
    nblk = nrows // r

    x4 = xp.reshape(n, nrows, n_phase, lanes)
    yb = yp.reshape(n, nrows, n_phase * n_phase).astype(jnp.bfloat16)

    kern = functools.partial(
        _bwd_kernel, n_phase=n_phase, num_classes=num_classes,
    )
    dx4 = pl.pallas_call(
        kern,
        grid=(n, nblk),
        in_specs=[
            pl.BlockSpec((1, r, n_phase, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, r, n_phase * n_phase), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, lanes), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, lanes), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, r, n_phase, lanes), lambda b, i: (b, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, nrows, n_phase, lanes), xp.dtype
        ),
        interpret=interpret,
    )(x4, yb, hot.reshape(n, 1, lanes), cold.reshape(n, 1, lanes))
    return dx4.reshape(xp.shape)


# ---- the A/B driver ----

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax
    import jax.numpy as jnp

    pd = sys.modules[__name__]
    from segmantic_tpu.train import losses as L

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    S, C, P = 48, 8, 8
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((B, S, S, S, P * C)) * 3,
                     jnp.bfloat16)
    yp = jnp.asarray(rng.integers(0, C, (B, S, S, S, P)), jnp.uint8)

    def xla_fwd(xp, yp):
        loss, _ = L._dice_phase_fwd(xp, yp, True, 1e-5, 1e-5)
        return loss

    def pl_fwd(xp, yp):
        inter, sump, cnt = pd.dice_phase_sums(xp, yp)
        dice = (2.0 * inter + 1e-5) / (sump + cnt + 1e-5)
        return jnp.mean(1.0 - dice)

    hot = jnp.asarray(rng.standard_normal((B, P * C)) * 1e-5, jnp.float32)
    cold = jnp.asarray(rng.standard_normal((B, P * C)) * 1e-6, jnp.float32)

    def xla_bwd(xp, yp):
        # the bwd sweep of _dice_phase_bwd with fixed hot/cold vectors
        n_phase, num_classes, g_mat, lane_cls = L._phase_geom(xp, yp)
        bshape = (xp.shape[0],) + (1,) * (xp.ndim - 2)
        m = jnp.max(xp, axis=-1, keepdims=True)
        p = L._phase_probs(xp, g_mat, m, dtype=xp.dtype)
        oh = jnp.repeat(yp, num_classes, axis=-1) == lane_cls
        d_probs = jnp.where(oh, hot.reshape(bshape + (-1,)).astype(xp.dtype),
                            cold.reshape(bshape + (-1,)).astype(xp.dtype))
        inner = jnp.einsum("...l,lv->...v", (p * d_probs), g_mat,
                           preferred_element_type=jnp.float32)
        inner_l = jnp.einsum("...v,vl->...l", inner, g_mat.T,
                             preferred_element_type=jnp.float32
                             ).astype(xp.dtype)
        return (p * (d_probs - inner_l)).astype(xp.dtype)

    def pl_bwd(xp, yp):
        return pd.dice_phase_dx(xp, yp, hot, cold)

    fns = {
        "xla_fwd": jax.jit(xla_fwd), "pl_fwd": jax.jit(pl_fwd),
        "xla_bwd": jax.jit(xla_bwd), "pl_bwd": jax.jit(pl_bwd),
    }
    v0 = float(fns["xla_fwd"](xp, yp))
    v1 = float(fns["pl_fwd"](xp, yp))
    print(f"loss xla {v0:.6f} pallas {v1:.6f} (diff {abs(v0-v1):.2e})")
    d0 = fns["xla_bwd"](xp, yp)
    d1 = fns["pl_bwd"](xp, yp)
    derr = float(jnp.max(jnp.abs(d0.astype(jnp.float32)
                                 - d1.astype(jnp.float32))))
    print(f"dx max diff {derr:.2e} (scale "
          f"{float(jnp.max(jnp.abs(d0.astype(jnp.float32)))):.2e})")

    def bench(fn, n=12, rounds=3):
        out = fn(xp, yp)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
              .astype(jnp.float32))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(xp, yp)
            float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
                  .astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    best = {k: float("inf") for k in fns}
    for _ in range(3):
        for k, fn in fns.items():
            best[k] = min(best[k], bench(fn))
    for k, v in best.items():
        print(f"{k:>8s}: {v*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
