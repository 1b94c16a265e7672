"""How much does the dice loss really cost inside the train fwd+bwd, and
does a dense-lane packed formulation beat it?

The logits' class axis (C=8) is the minor dim; TPU arrays tile (8,128), so
a (..., 8) array physically wastes 15/16 of every lane group and every
elementwise sweep (exp, mul) runs at ~6% VPU efficiency. Candidate fix:
one relayout (B,S,C) -> (B, V/P, P*C=128) (row-major reinterpretation +
TPU retile), then:
  - exp(x - global_max) as ONE dense sweep (no per-voxel max needed: a
    global scalar max keeps exp in f32 range; Z normalizes exactly);
  - per-voxel Z via a (128 x P) 0/1 matmul on the MXU;
  - p = E * (Zinv @ G^T) dense;
  - packed one-hot on the fly: lane l of row r is labeled iff
    y[r, l//C] == l % C (pure compare, fused into the reduce).
Exact up to f32 sum reassociation.

Interleaved best-of (the pool swings 3-5x between runs — never compare
across scripts):
  lag_dice   full model fwd+bwd with dice loss (batch 32)
  lag_sq     same with a trivial mean-square loss — the difference is the
             dice's TRUE in-graph cost (fwd+bwd, fused context)
  dice       standalone dice fwd+bwd
  dice_pack  standalone packed-layout dice fwd+bwd
Run: python exp/dice_cost.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.ops import pallas_conv
    from segmantic_tpu.train.losses import dice_loss

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
    logits = jnp.asarray(rng.standard_normal((B, S, S, S, C)), dt)

    def make_lag(loss_fn):
        def lag(p, bs, im, lb):
            with pallas_conv.packed_routing(None):
                def f(pp):
                    out, mut = model.apply(
                        {"params": pp, "batch_stats": bs}, im,
                        training=True, mutable=["batch_stats"],
                    )
                    return loss_fn(out, lb), 0.0
                (loss, _), grads = jax.value_and_grad(f, has_aux=True)(p)
            return loss, grads
        return jax.jit(lag)

    lag_dice = make_lag(dice_loss)
    lag_sq = make_lag(lambda o, l: jnp.mean(jnp.square(o.astype(jnp.float32))))

    from functools import partial

    from segmantic_tpu.ops import fast_conv
    from segmantic_tpu.train.losses import _dice_reference, dice_loss_phase

    # autodiff dice (no custom VJP): does the VJP boundary block fusion?
    lag_auto = make_lag(
        partial(_dice_reference, include_background=True,
                smooth_nr=1e-5, smooth_dr=1e-5, apply_softmax=True)
    )

    # phase-major dice: consume the top stage's phase tensor directly —
    # the full-resolution (...,8)-minor logits never materialize
    def lag_phase_fn(p, bs, im, lb):
        with pallas_conv.packed_routing(None):
            lb_ph = fast_conv.space_to_depth(lb[..., None])
            def f(pp):
                out, mut = model.apply(
                    {"params": pp, "batch_stats": bs}, im,
                    training=True, mutable=["batch_stats"],
                    phase_logits=True,
                )
                return dice_loss_phase(out, lb_ph), 0.0
            (loss, _), grads = jax.value_and_grad(f, has_aux=True)(p)
        return loss, grads

    lag_phase = jax.jit(lag_phase_fn)

    # isolate the pieces: softmax sweep only / per-class masked sums only
    lag_soft = make_lag(
        lambda o, l: jnp.mean(jax.nn.softmax(o.astype(jnp.float32), axis=-1))
    )

    def classsum_loss(o, l):
        oh = jax.nn.one_hot(l, o.shape[-1], dtype=jnp.float32)
        s = jnp.sum(o.astype(jnp.float32) * oh, axis=(1, 2, 3))  # (n, c)
        d = jnp.sum(o.astype(jnp.float32), axis=(1, 2, 3))
        return jnp.mean(s / (d + 1.0))

    lag_csum = make_lag(classsum_loss)

    # --- packed-layout dice ---
    P = 128 // C

    def dice_packed(lg, lb, smooth=1e-5):
        n = lg.shape[0]
        x = lg.astype(jnp.float32).reshape(n, -1, P * C)     # (n, R, 128)
        y = lb.reshape(n, -1, P)                             # (n, R, P)
        g = jax.lax.stop_gradient(jnp.max(x))
        E = jnp.exp(x - g)                                   # dense sweep
        G = jnp.asarray(
            np.repeat(np.eye(P, dtype=np.float32), C, axis=0))  # (128, P)
        Z = E @ G                                            # (n, R, P)
        p = E * (1.0 / Z) @ G.T if False else E * ((1.0 / Z) @ G.T)
        lane_cls = jnp.arange(P * C, dtype=jnp.int32) % C    # (128,)
        y_rep = jnp.repeat(y, C, axis=-1)                    # (n, R, 128)
        oh = (y_rep == lane_cls).astype(jnp.float32)
        inter = jnp.sum(p * oh, axis=1).reshape(n, P, C).sum(axis=1)
        sum_p = jnp.sum(p, axis=1).reshape(n, P, C).sum(axis=1)
        count = jnp.sum(oh, axis=1).reshape(n, P, C).sum(axis=1)
        dice = (2 * inter + smooth) / (sum_p + count + smooth)
        return jnp.mean(1.0 - dice)

    dice_j = jax.jit(jax.value_and_grad(lambda lg: dice_loss(lg, label)))
    dice_pk_j = jax.jit(jax.value_and_grad(lambda lg: dice_packed(lg, label)))

    v0 = float(dice_loss(logits, label))
    v1 = float(dice_packed(logits, label))
    print(f"dice ref {v0:.6f} packed {v1:.6f} (diff {abs(v0-v1):.2e})")

    def bench(fn, args, n=8, rounds=4):
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    lag_pack = make_lag(dice_packed)

    timers = {
        "lag_dice": lambda: bench(lag_dice, (params, batch_stats, image, label), n=4),
        "lag_sq": lambda: bench(lag_sq, (params, batch_stats, image, label), n=4),
        "lag_pack": lambda: bench(lag_pack, (params, batch_stats, image, label), n=4),
        "dice": lambda: bench(dice_j, (logits,)),
        "dice_pack": lambda: bench(dice_pk_j, (logits,)),
    }
    for name, fn in timers.items():  # warmup compiles
        fn()
    best = {k: float("inf") for k in timers}
    for r in range(3):
        for name, fn in timers.items():
            best[name] = min(best[name], fn())
    for name, v in best.items():
        print(f"{name:>10s}: {v*1e3:8.1f} ms")
    print(f"dice in-graph cost (lag_dice - lag_sq): "
          f"{(best['lag_dice']-best['lag_sq'])*1e3:8.1f} ms")
    print(f"packed in-graph cost (lag_pack - lag_sq): "
          f"{(best['lag_pack']-best['lag_sq'])*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
