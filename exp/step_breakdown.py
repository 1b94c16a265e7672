"""Where does the batch-32 flagship step spend its time?

Interleaved (same-script, round-robin — the tunnel pool swings 3-5x
between runs, so never compare across scripts) timings of:
  step     the full production train step (aug + fwd/bwd + adam)
  aug      augment_batch alone (f32 in, bf16 out)
  fwdbwd   loss/grad alone on a pre-augmented bf16 batch
  dice     dice loss fwd+bwd alone at logits shape
Each timed over n steps with a host-transfer fence. Run ad hoc:
  python exp/step_breakdown.py
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
    from segmantic_tpu.ops import pallas_conv
    from segmantic_tpu.train.augment import AugmentConfig, augment_batch
    from segmantic_tpu.train.losses import dice_loss
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    patch = (96, 96, 96)
    margin = 24
    margin_shape = tuple(p + 2 * margin for p in patch)
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
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = opt.init(params)

    aug_cfg = AugmentConfig(spatial=True, intensity=True)
    import dataclasses

    aug_cfg_bf16 = dataclasses.replace(aug_cfg, interp_bf16=True)
    step = make_train_step(model, opt, aug_cfg, patch, mixed_precision=True)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((batch,) + margin_shape + (1,)), jnp.float32)
    label = jnp.asarray(rng.integers(0, num_classes, (batch,) + margin_shape), jnp.int32)
    key = jax.random.key(0)

    # pre-augmented bf16 batch for the isolated fwd/bwd + dice timings
    aug_jit = jax.jit(
        lambda im, lb, k: augment_batch(im, lb, k, aug_cfg_bf16, patch)
    )
    image_a, label_a = aug_jit(image, label, key)
    image_a = image_a.astype(jnp.bfloat16)

    def lag(params, batch_stats, im, lb):
        with pallas_conv.packed_routing(None):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, im,
                    training=True, mutable=["batch_stats"],
                )
                return dice_loss(out, lb), mut.get("batch_stats", batch_stats)

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, bs, grads

    lag_jit = jax.jit(lag)

    logits = jnp.asarray(
        rng.standard_normal((batch,) + patch + (num_classes,)), jnp.bfloat16
    )
    label_p = label_a
    dice_jit = jax.jit(jax.value_and_grad(lambda lg: dice_loss(lg, label_p)))

    def t_step(n):
        nonlocal params, batch_stats, opt_state, key
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, image, label, sub
            )
        float(loss)
        return (time.perf_counter() - t0) / n

    def t_aug(n):
        nonlocal key
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            im, lb = aug_jit(image, label, sub)
        float(im.astype(jnp.float32).ravel()[0])
        return (time.perf_counter() - t0) / n

    def t_fwdbwd(n):
        t0 = time.perf_counter()
        for _ in range(n):
            loss, bs, grads = lag_jit(params, batch_stats, image_a, label_a)
        float(loss)
        return (time.perf_counter() - t0) / n

    def t_dice(n):
        t0 = time.perf_counter()
        for _ in range(n):
            v, g = dice_jit(logits)
        float(v)
        return (time.perf_counter() - t0) / n

    timers = {"step": t_step, "aug": t_aug, "fwdbwd": t_fwdbwd, "dice": t_dice}
    # compile warmup
    for name, fn in timers.items():
        fn(1)
    best = {k: float("inf") for k in timers}
    for r in range(4):  # round-robin rounds
        for name, fn in timers.items():
            best[name] = min(best[name], fn(3))
    for name, v in best.items():
        print(f"{name:>7s}: {v * 1e3:8.1f} ms")
    resid = best["step"] - best["aug"] - best["fwdbwd"]
    print(f"step - aug - fwdbwd (adam + upcast + overlap): {resid * 1e3:8.1f} ms")
    vox = batch * int(np.prod(patch))
    print(f"implied vox/s/chip from best step: {vox / best['step'] / 1e6:.1f}M")


if __name__ == "__main__":
    main()
