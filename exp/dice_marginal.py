"""Marginal cost of the dice loss inside the fused fwd+bwd.

Interleaved A/B at the flagship batch-32 shape: value_and_grad of
  A: dice_loss(logits, label)        (production)
  B: sum(logits * fixed_noise)       (control: dense structureless
     cotangent — a mean/constant control lets XLA constant-fold the
     decoder backward and understates the baseline)
The difference is what dice actually adds once XLA has fused it into the
step — standalone dice timings overcount (dispatch + unfused isolation).
Run ad hoc when the box is idle: python exp/dice_marginal.py
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

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.losses import dice_loss

    patch = (96, 96, 96)
    batch = 32
    num_classes = 8

    model = UNet(
        spatial_dims=3, in_channels=1, out_channels=num_classes,
        channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2), num_res_units=2,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + patch + (1,), jnp.float32),
        training=False,
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.standard_normal((batch,) + patch + (1,)), jnp.bfloat16
    )
    label = jnp.asarray(rng.integers(0, num_classes, (batch,) + patch), jnp.int32)

    noise = jnp.asarray(
        rng.standard_normal((batch,) + patch + (num_classes,)), jnp.bfloat16
    )

    def make_lag(use_dice):
        # noise must be an ARGUMENT: a closure constant gets baked into the
        # HLO and the remote-compile tunnel rejects the 452MB body (HTTP 413)
        def loss_fn(p, nz):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, image,
                training=True, mutable=["batch_stats"],
            )
            if use_dice:
                return dice_loss(out, label)
            # dense random cotangent: bwd does full work, zero loss math
            return jnp.sum(out.astype(jnp.float32) * nz.astype(jnp.float32))

        return jax.jit(jax.value_and_grad(loss_fn))

    lag_dice = make_lag(True)
    lag_mean = make_lag(False)

    def t(fn, n=3):
        t0 = time.perf_counter()
        for _ in range(n):
            v, g = fn(params, noise)
        float(v)
        return (time.perf_counter() - t0) / n

    t(lag_dice, 1)
    t(lag_mean, 1)
    best_d, best_m = float("inf"), float("inf")
    for _ in range(4):
        best_d = min(best_d, t(lag_dice))
        best_m = min(best_m, t(lag_mean))
    print(f"fwd+bwd with dice : {best_d * 1e3:8.1f} ms")
    print(f"fwd+bwd with mean : {best_m * 1e3:8.1f} ms")
    print(f"marginal dice cost: {(best_d - best_m) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
