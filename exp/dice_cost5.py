"""In-graph cost of the matmul-segmented phase dice (exp/dice_phase_mm.py)
vs the current dice and an mse anchor, interleaved best-of (time-shared
pool: never compare across runs).

  lag_sq     fwd+bwd, mean-square loss (anchor: loss-free step cost)
  lag_dice   fwd+bwd, production dice on full-res logits (current default)
  lag_phmm   fwd+bwd, custom-VJP matmul-segmented dice on the phase tensor
Run: python exp/dice_cost5.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.ops import fast_conv, pallas_conv
    from segmantic_tpu.train.losses import dice_loss

    # ---- custom-VJP matmul-segmented phase dice (exp/dice_phase_mm.py)
    @partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def phase_mm_vjp(xp, yp, smooth_nr=1e-5, smooth_dr=1e-5):
        loss, _ = _fwd(xp, yp, smooth_nr, smooth_dr)
        return loss

    def _pg(xp, yp):
        N, L, P = xp.shape[0], xp.shape[-1], yp.shape[-1]
        C = L // P
        x = xp.reshape(N, -1, L)
        y = yp.reshape(N, -1, P)
        G = jnp.asarray(np.kron(np.eye(P), np.ones((C, 1))).astype(np.float32))
        lane_cls = jnp.arange(L, dtype=y.dtype) % C
        return N, L, P, C, x, y, G, lane_cls

    def _fwd(xp, yp, smooth_nr, smooth_dr):
        N, L, P, C, x, y, G, lane_cls = _pg(xp, yp)
        m = jnp.max(x, axis=-1, keepdims=True)
        E = jnp.exp((x - m).astype(jnp.float32))
        Zr = (1.0 / (E @ G)) @ G.T
        p = E * Zr
        oh = jnp.repeat(y, C, axis=-1) == lane_cls
        inter = jnp.sum(jnp.where(oh, p, 0.0), axis=1)
        sum_p = jnp.sum(p, axis=1)
        cnt = jnp.sum(oh.astype(jnp.float32), axis=1)

        def fold(a):
            return a.reshape(N, P, C).sum(axis=1)

        inter = fold(inter)
        denom = fold(sum_p) + fold(cnt)
        dice = (2 * inter + smooth_nr) / (denom + smooth_dr)
        return jnp.mean(1.0 - dice), (xp, yp, inter, denom)

    def _bwd(smooth_nr, smooth_dr, res, g):
        xp, yp, inter, denom = res
        N, L, P, C, x, y, G, lane_cls = _pg(xp, yp)
        inv = 1.0 / (denom + smooth_dr)
        scale = g / inter.size
        d_inter = -scale * 2.0 * inv
        d_denom = scale * (2.0 * inter + smooth_nr) * inv * inv
        tile = jnp.tile(jnp.eye(C, dtype=jnp.float32), (1, P))
        di_l = d_inter @ tile
        dd_l = d_denom @ tile
        m = jnp.max(x, axis=-1, keepdims=True)
        E = jnp.exp((x - m).astype(jnp.float32))
        Zr = (1.0 / (E @ G)) @ G.T
        p = E * Zr
        oh = jnp.repeat(y, C, axis=-1) == lane_cls
        d_probs = jnp.where(oh, di_l[:, None, :], 0.0) + dd_l[:, None, :]
        inner = ((p * d_probs) @ G) @ G.T
        d_x = (p * (d_probs - inner)).astype(xp.dtype)
        return d_x.reshape(xp.shape), np.zeros(yp.shape, jax.dtypes.float0)

    phase_mm_vjp.defvjp(_fwd, _bwd)

    B, S, C = 32, 96, 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=C,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, S, S, S, 1), jnp.float32),
                           training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    image = jnp.asarray(rng.standard_normal((B, S, S, S, 1)), dt)
    label = jnp.asarray(rng.integers(0, C, (B, S, S, S)), jnp.int32)

    def make_lag(loss_fn, phase=False):
        def lag(p, bs, im, lb):
            with pallas_conv.packed_routing(None):
                if phase:
                    lb = fast_conv.space_to_depth(lb[..., None])
                def f(pp):
                    out, mut = model.apply(
                        {"params": pp, "batch_stats": bs}, im,
                        training=True, mutable=["batch_stats"],
                        phase_logits=phase,
                    )
                    return loss_fn(out, lb), 0.0
                (loss, _), grads = jax.value_and_grad(f, has_aux=True)(p)
            return loss, grads
        return jax.jit(lag)

    lag_sq = make_lag(lambda o, l: jnp.mean(jnp.square(o.astype(jnp.float32))))
    lag_dice = make_lag(dice_loss)
    lag_phmm = make_lag(phase_mm_vjp, phase=True)

    # value sanity: phmm loss == dice loss on the same params
    v_dice = float(lag_dice(params, batch_stats, image, label)[0])
    v_phmm = float(lag_phmm(params, batch_stats, image, label)[0])
    print(f"loss dice {v_dice:.6f} phmm {v_phmm:.6f} "
          f"(diff {abs(v_dice-v_phmm):.2e})")

    def bench(fn, n=4, rounds=3):
        out = fn(params, batch_stats, image, label)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(params, batch_stats, image, label)
            float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    timers = {"lag_sq": lag_sq, "lag_dice": lag_dice, "lag_phmm": lag_phmm}
    for fn in timers.values():
        bench(fn, n=1, rounds=1)  # compile
    best = {k: float("inf") for k in timers}
    for _ in range(3):
        for name, fn in timers.items():
            best[name] = min(best[name], bench(fn))
    for name, v in best.items():
        print(f"{name:>9s}: {v*1e3:8.1f} ms")
    print(f"dice in-graph (lag_dice - lag_sq): "
          f"{(best['lag_dice']-best['lag_sq'])*1e3:8.1f} ms")
    print(f"phmm in-graph (lag_phmm - lag_sq): "
          f"{(best['lag_phmm']-best['lag_sq'])*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
