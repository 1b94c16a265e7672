"""Bisect the in-graph dice overhead (exp/dice_cost.py found ~75 ms at
batch 32 where standalone dice fwd+bwd is ~12 ms).

Variants (interleaved best-of):
  fwd_dice / fwd_sq     forward-only loss: is the gap fwd or bwd?
  lag_dice / lag_sq     fwd+bwd, phase decoder stages ON (production)
  lagP_dice / lagP_sq   fwd+bwd, SEGMANTIC_PHASE_TOP=off (plain decoder):
                        does the dice d_logits hit the phase-stage s2d
                        boundary badly?
Run: python exp/dice_cost2.py
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

    sq = lambda o, l: jnp.mean(jnp.square(o.astype(jnp.float32)))

    def make_fwd(loss_fn):
        def fwd(p, bs, im, lb):
            with pallas_conv.packed_routing(None):
                out, _ = model.apply(
                    {"params": p, "batch_stats": bs}, im,
                    training=True, mutable=["batch_stats"],
                )
                return loss_fn(out, lb)
        return jax.jit(fwd)

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

    fwd_dice, fwd_sq = make_fwd(dice_loss), make_fwd(sq)
    lag_dice, lag_sq = make_lag(dice_loss), make_lag(sq)

    # plain decoder (no phase stages): new trace via env toggle
    os.environ["SEGMANTIC_PHASE_TOP"] = "off"

    def make_lag_plain(loss_fn):
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

    # trace NOW while env is off (jit traces lazily → force with warmup later
    # under the env; simplest: trace eagerly here)
    lagP_dice, lagP_sq = make_lag_plain(dice_loss), make_lag_plain(sq)
    lagP_dice(params, batch_stats, image, label)  # traced with phase off
    lagP_sq(params, batch_stats, image, label)
    os.environ["SEGMANTIC_PHASE_TOP"] = "on"

    def bench(fn, args, n=4, rounds=3):
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

    args = (params, batch_stats, image, label)
    timers = {
        "fwd_dice": fwd_dice, "fwd_sq": fwd_sq,
        "lag_dice": lag_dice, "lag_sq": lag_sq,
        "lagP_dice": lagP_dice, "lagP_sq": lagP_sq,
    }
    for f in timers.values():
        bench(f, args, n=1, rounds=1)  # warmup
    best = {k: float("inf") for k in timers}
    for r in range(3):
        for name, f in timers.items():
            best[name] = min(best[name], bench(f, args))
    for name, v in best.items():
        print(f"{name:>10s}: {v*1e3:8.1f} ms")
    print(f"fwd gap  {1e3*(best['fwd_dice']-best['fwd_sq']):7.1f} ms")
    print(f"lag gap  {1e3*(best['lag_dice']-best['lag_sq']):7.1f} ms")
    print(f"lagP gap {1e3*(best['lagP_dice']-best['lagP_sq']):7.1f} ms")


if __name__ == "__main__":
    main()
