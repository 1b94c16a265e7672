"""Matmul-segmented dice on the phase tensor: CPU validation of value and
gradient vs the reference dice (autodiff), then the custom-VJP variant.

The in-graph dice costs ~75 ms at batch 32 (exp/dice_cost*.py) because XLA
rewrites the softmax's per-voxel max/normalizer broadcasts into the
depth-to-space's 8-dim phase view with a SPATIAL lane layout, materializing
3x 906 MB f32 broadcasts + 3x relayout copies (~9 GB; exp/dice_hlo.py,
exp/hlo_diff.py). Consuming the phase tensor directly with
matmul-broadcast segmented softmax avoids every full-volume broadcast.

Run: SEGMANTIC_FORCE_PLATFORM=cpu python exp/dice_phase_mm.py
"""

from __future__ import annotations

import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SEGMANTIC_FORCE_PLATFORM", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from segmantic_tpu.train.losses import dice_loss, dice_loss_phase

    def phase_mm(phase_logits, phase_labels, smooth_nr=1e-5, smooth_dr=1e-5):
        N = phase_logits.shape[0]
        L = phase_logits.shape[-1]
        P = phase_labels.shape[-1]
        C = L // P
        x = phase_logits.reshape(N, -1, L)
        y = phase_labels.reshape(N, -1, P)
        G = jnp.asarray(np.kron(np.eye(P), np.ones((C, 1))).astype(np.float32))
        m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
        E = jnp.exp((x - m).astype(jnp.float32))
        Z = E @ G                                    # (N, R, P)
        Zr = (1.0 / Z) @ G.T                         # (N, R, L)
        p = E * Zr
        lane_cls = jnp.arange(L, dtype=y.dtype) % C
        oh = jnp.repeat(y, C, axis=-1) == lane_cls
        inter = jnp.sum(jnp.where(oh, p, 0.0), axis=1)
        sum_p = jnp.sum(p, axis=1)
        cnt = jnp.sum(oh.astype(jnp.float32), axis=1)

        def fold(a):
            return a.reshape(N, P, C).sum(axis=1)

        inter, sum_p, cnt = fold(inter), fold(sum_p), fold(cnt)
        dice = (2 * inter + smooth_nr) / (sum_p + cnt + smooth_dr)
        return jnp.mean(1.0 - dice)

    # ---- custom VJP variant: tiny residuals, one recompute sweep in bwd
    @partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def phase_mm_vjp(xp, yp, smooth_nr=1e-5, smooth_dr=1e-5):
        loss, _ = _fwd(xp, yp, smooth_nr, smooth_dr)
        return loss

    def _sums(xp, yp):
        N, L, P = xp.shape[0], xp.shape[-1], yp.shape[-1]
        C = L // P
        x = xp.reshape(N, -1, L)
        y = yp.reshape(N, -1, P)
        G = jnp.asarray(np.kron(np.eye(P), np.ones((C, 1))).astype(np.float32))
        m = jnp.max(x, axis=-1, keepdims=True)
        E = jnp.exp((x - m).astype(jnp.float32))
        Zr = (1.0 / (E @ G)) @ G.T
        p = E * Zr
        lane_cls = jnp.arange(L, dtype=y.dtype) % C
        oh = jnp.repeat(y, C, axis=-1) == lane_cls
        inter = jnp.sum(jnp.where(oh, p, 0.0), axis=1)
        sum_p = jnp.sum(p, axis=1)
        cnt = jnp.sum(oh.astype(jnp.float32), axis=1)

        def fold(a):
            return a.reshape(N, P, C).sum(axis=1)

        return fold(inter), fold(sum_p) + fold(cnt), (x, y, G, lane_cls)

    def _fwd(xp, yp, smooth_nr, smooth_dr):
        inter, denom, _ = _sums(xp, yp)
        dice = (2 * inter + smooth_nr) / (denom + smooth_dr)
        return jnp.mean(1.0 - dice), (xp, yp, inter, denom)

    def _bwd(smooth_nr, smooth_dr, res, g):
        xp, yp, inter, denom = res
        N, L, P = xp.shape[0], xp.shape[-1], yp.shape[-1]
        C = L // P
        x = xp.reshape(N, -1, L)
        y = yp.reshape(N, -1, P)
        G = jnp.asarray(np.kron(np.eye(P), np.ones((C, 1))).astype(np.float32))
        inv = 1.0 / (denom + smooth_dr)
        scale = g / inter.size
        d_inter = -scale * 2.0 * inv                     # (N, C)
        d_denom = scale * (2.0 * inter + smooth_nr) * inv * inv
        # per-lane constants: lane l gets class l % C
        tile = jnp.tile(jnp.eye(C, dtype=jnp.float32), (1, P))  # (C, L)
        di_l = d_inter @ tile                            # (N, L)
        dd_l = d_denom @ tile
        m = jnp.max(x, axis=-1, keepdims=True)
        E = jnp.exp((x - m).astype(jnp.float32))
        Zr = (1.0 / (E @ G)) @ G.T
        p = E * Zr
        lane_cls = jnp.arange(L, dtype=y.dtype) % C
        oh = jnp.repeat(y, C, axis=-1) == lane_cls
        d_probs = jnp.where(oh, di_l[:, None, :], 0.0) + dd_l[:, None, :]
        inner = ((p * d_probs) @ G) @ G.T                # per-voxel, lanes
        d_x = (p * (d_probs - inner)).astype(xp.dtype)
        return d_x.reshape(xp.shape), np.zeros(yp.shape, jax.dtypes.float0)

    phase_mm_vjp.defvjp(_fwd, _bwd)

    # ---- validation on small shapes
    rng = np.random.default_rng(1)
    N, S, C, nd = 2, 8, 5, 3
    n_phase = 2 ** nd
    L = n_phase * C
    xp = jnp.asarray(rng.standard_normal((N, S, S, S, L)) * 4, jnp.float32)
    yp = jnp.asarray(rng.integers(0, C, (N, S, S, S, n_phase)), jnp.int32)

    ref = dice_loss_phase(xp, yp)
    got = phase_mm(xp, yp)
    got2 = phase_mm_vjp(xp, yp)
    print(f"value: ref {float(ref):.7f} mm {float(got):.7f} "
          f"vjp {float(got2):.7f}")
    assert abs(float(ref) - float(got)) < 2e-6
    assert abs(float(ref) - float(got2)) < 2e-6

    g_ref = jax.grad(lambda a: dice_loss_phase(a, yp))(xp)
    g_mm = jax.grad(lambda a: phase_mm(a, yp))(xp)
    g_vjp = jax.grad(lambda a: phase_mm_vjp(a, yp))(xp)
    for name, gg in [("mm", g_mm), ("vjp", g_vjp)]:
        err = float(jnp.max(jnp.abs(gg - g_ref)))
        rel = err / float(jnp.max(jnp.abs(g_ref)))
        print(f"grad {name}: max abs err {err:.3e} (rel {rel:.3e})")
        assert rel < 1e-4, (name, rel)

    # bf16 path (production dtype)
    xb = xp.astype(jnp.bfloat16)
    vb = float(phase_mm_vjp(xb, yp))
    gb = jax.grad(lambda a: phase_mm_vjp(a, yp))(xb)
    assert gb.dtype == jnp.bfloat16
    print(f"bf16: value {vb:.6f} grad dtype {gb.dtype} finite "
          f"{bool(jnp.all(jnp.isfinite(gb.astype(jnp.float32))))}")
    print("OK")


if __name__ == "__main__":
    main()
