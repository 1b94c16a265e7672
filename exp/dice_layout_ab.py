"""Dice loss layout A/B: is the (…, C=8)-minor layout the bottleneck?

With channel-last logits the class axis (8) sits in the 128-lane minor
dim — 1/16 lane occupancy for every elementwise op in the loss. Variants:
  A: production custom-VJP dice (losses.dice_loss) on (N, *S, 8)
  B: class-major math — transpose to (N, 8, V) once, all softmax/one-hot/
     reduction math on dense (N, V) planes, transpose the gradient back
  C: autodiff reference (losses._dice_reference)
All exact (same f32 formulas). Interleaved best-of timings, n>=10 per
measurement. Run ad hoc: python exp/dice_layout_ab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.train.losses import _dice_reference, dice_loss

    batch, patch, C = 32, (96, 96, 96), 8
    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.standard_normal((batch,) + patch + (C,)), jnp.bfloat16
    )
    labels = jnp.asarray(rng.integers(0, C, (batch,) + patch), jnp.int32)
    snr = sdr = 1e-5

    def dice_cm(lg, lb):
        # class-major: (N, V, C) -> (N, C, V); every op runs on dense planes
        n = lg.shape[0]
        x = jnp.swapaxes(lg.reshape(n, -1, C), 1, 2).astype(jnp.float32)
        y = lb.reshape(n, 1, -1)
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        probs = e / jnp.sum(e, axis=1, keepdims=True)
        onehot = (y == jnp.arange(C).reshape(1, C, 1)).astype(jnp.float32)
        inter = jnp.sum(probs * onehot, axis=2)
        denom = jnp.sum(probs, axis=2) + jnp.sum(onehot, axis=2)
        dice = (2.0 * inter + snr) / (denom + sdr)
        return jnp.mean(1.0 - dice)

    fns = {
        "custom_vjp": jax.jit(jax.value_and_grad(lambda l: dice_loss(l, labels))),
        "class_major": jax.jit(jax.value_and_grad(lambda l: dice_cm(l, labels))),
        "autodiff_ref": jax.jit(jax.value_and_grad(
            lambda l: _dice_reference(
                l, labels, include_background=True, smooth_nr=snr,
                smooth_dr=sdr, apply_softmax=True,
            )
        )),
    }

    vals = {}
    for name, fn in fns.items():  # compile + value check
        v, g = fn(logits)
        vals[name] = float(v)
        float(v)
    print("values:", {k: round(v, 6) for k, v in vals.items()})

    def t(fn, n=10):
        t0 = time.perf_counter()
        for _ in range(n):
            v, g = fn(logits)
        float(v)
        return (time.perf_counter() - t0) / n

    best = {k: float("inf") for k in fns}
    for _ in range(4):
        for name, fn in fns.items():
            best[name] = min(best[name], t(fn))
    for name, v in best.items():
        print(f"{name:>12s}: {v * 1e3:7.1f} ms (value_and_grad standalone)")


if __name__ == "__main__":
    main()
