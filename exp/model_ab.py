"""In-model A/B of the fast-conv rewrites: flagship fwd / fwd+bwd, one script.

Baseline = eligibility gates forced off (plain XLA convs); variant = gates
on. Interleaved because the TPU pool is time-shared. Run:
    python exp/model_ab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench(fn, args, n=10, rounds=3):
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


def main():
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.ops import fast_conv
    from segmantic_tpu.train.losses import dice_loss

    print("backend:", jax.default_backend(), flush=True)
    B = 8
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    x32 = jnp.zeros((B, 96, 96, 96, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x32[:1], training=False)
    x = x32.astype(jnp.bfloat16)
    label = jnp.zeros((B, 96, 96, 96), jnp.int32)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    def train_loss(p, b, a):
        out, _ = model.apply({"params": p, "batch_stats": b}, a,
                             training=True, mutable=["batch_stats"])
        return dice_loss(out, label)

    from segmantic_tpu.ops import pallas_conv

    real_s2d = fast_conv.s2d_eligible
    real_sub = fast_conv.subpixel_eligible
    real_packed = pallas_conv.packed_route_supported

    def off(*a, **k):
        return False

    results = {}
    for tag in ("base", "fast", "base2", "fast2"):
        use = tag.startswith("fast")
        fast_conv.s2d_eligible = real_s2d if use else off
        fast_conv.subpixel_eligible = real_sub if use else off
        pallas_conv.packed_route_supported = real_packed if use else off
        fwd = jax.jit(lambda v, a: model.apply(v, a, training=False))
        fwdbwd = jax.jit(lambda p, b, a: jax.grad(train_loss)(p, b, a))
        t_f = bench(fwd, (variables, x))
        t_fb = bench(fwdbwd, (params, bstats, x), n=5)
        results[tag] = (t_f, t_fb)
        print(f"{tag:6s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms",
              flush=True)

    bf = min(results["base"][0], results["base2"][0])
    bb = min(results["base"][1], results["base2"][1])
    ff = min(results["fast"][0], results["fast2"][0])
    fb = min(results["fast"][1], results["fast2"][1])
    print(f"best-of: fwd {bf*1e3:.2f} -> {ff*1e3:.2f} ms ({bf/ff:.2f}x)   "
          f"fwd+bwd {bb*1e3:.2f} -> {fb*1e3:.2f} ms ({bb/fb:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
