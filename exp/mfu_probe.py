"""MFU probe: where does the train step's time go, and what helps?

Times the flagship model's forward / forward+backward and the isolated
building blocks (per-stage convs, norm variants, augmentation) on the real
TPU, with analytical FLOP counts from XLA's cost analysis, so optimizations
target the measured hotspot instead of guesses. Run ad hoc:
    python exp/mfu_probe.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s


def bench(fn, args, n=6, rounds=3, warmup=True):
    """best-of-rounds seconds per call, host-transfer fenced (tunnel-safe)."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def flops_of(fn, *args):
    import jax

    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def report(name, secs, flops):
    mfu = flops / secs / V5E_BF16_PEAK * 100 if flops else 0.0
    print(f"{name:<42s} {secs*1e3:8.2f} ms  {flops/1e9:9.1f} GF  {mfu:5.1f}% MFU",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.augment import AugmentConfig, augment_batch
    from segmantic_tpu.train.losses import dice_loss

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B = args.batch
    patch = (96, 96, 96)

    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    x32 = jnp.zeros((B,) + patch + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x32[:1], training=False)
    x = x32.astype(jnp.bfloat16)
    label = jnp.zeros((B,) + patch, jnp.int32)

    fwd = jax.jit(lambda v, a: model.apply(v, a, training=False))
    report("fwd eval (bf16)", bench(fwd, (variables, x)), flops_of(
        lambda v, a: model.apply(v, a, training=False), variables, x))

    def train_loss(params, bs, a):
        out, _ = model.apply({"params": params, "batch_stats": bs}, a,
                             training=True, mutable=["batch_stats"])
        return dice_loss(out, label)

    params, bs = variables["params"], variables.get("batch_stats", {})
    fwdbwd = jax.jit(lambda p, b, a: jax.grad(train_loss)(p, b, a))
    report("fwd+bwd (bf16)", bench(fwdbwd, (params, bs, x), n=3),
           flops_of(lambda p, b, a: jax.grad(train_loss)(p, b, a), params, bs, x))

    # augmentation alone
    margin = tuple(p + 48 for p in patch)
    img_m = jnp.zeros((B,) + margin + (1,), jnp.float32)
    lbl_m = jnp.zeros((B,) + margin, jnp.int32)
    cfg = AugmentConfig(spatial=True, intensity=True)
    aug = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg, patch))
    report("fused augmentation", bench(aug, (img_m, lbl_m, jax.random.key(0)), n=3), 0)

    if args.quick:
        return

    # isolated conv stages (bf16, channel-last, SAME padding, stride 1)
    from flax import linen as nn

    def conv_probe(name, spatial, cin, cout, stride=1, dtype=jnp.bfloat16):
        class C(nn.Module):
            @nn.compact
            def __call__(self, a):
                return nn.Conv(cout, (3, 3, 3), strides=(stride,) * 3,
                               padding="SAME", dtype=dtype)(a)

        m = C()
        a = jnp.zeros((B,) + (spatial,) * 3 + (cin,), dtype)
        v = m.init(jax.random.key(0), a)
        f = jax.jit(lambda vv, aa: m.apply(vv, aa))
        report(name, bench(f, (v, a)), flops_of(lambda vv, aa: m.apply(vv, aa), v, a))

    conv_probe("conv 16->16 @48^3 bf16", 48, 16, 16)
    conv_probe("conv 16->16 @48^3 f32", 48, 16, 16, dtype=jnp.float32)
    conv_probe("conv 32->32 @24^3 bf16", 24, 32, 32)
    conv_probe("conv 64->64 @12^3 bf16", 12, 64, 64)
    conv_probe("conv 128->128 @6^3 bf16", 6, 128, 128)
    conv_probe("conv 256->256 @6^3 bf16", 6, 256, 256)
    conv_probe("conv 1->16 s2 @96^3 bf16", 96, 1, 16, stride=2)

    # batchnorm + prelu at the expensive stage
    class NB(nn.Module):
        @nn.compact
        def __call__(self, a):
            a = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=a.dtype)(a)
            alpha = self.param("alpha", lambda k: jnp.full((1,), 0.25, jnp.float32))
            return jnp.where(a >= 0, a, alpha.astype(a.dtype) * a)

    m = NB()
    a = jnp.zeros((B, 48, 48, 48, 16), jnp.bfloat16)
    v = m.init(jax.random.key(0), a)
    f = jax.jit(lambda vv, aa: m.apply(vv, aa, mutable=["batch_stats"])[0])
    report("batchnorm+prelu @48^3x16 bf16", bench(f, (v, a)), 0)


if __name__ == "__main__":
    main()
