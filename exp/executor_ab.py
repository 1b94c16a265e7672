"""Eval-forward A/B: flax module.apply vs packed-layout executor.

Flagship 3D UNet, 8x96^3 bf16 windows — the sliding-window predictor
shape. Interleaved (TPU pool is time-shared). Run: python exp/executor_ab.py
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
    import numpy as np

    from segmantic_tpu.infer.executor import make_eval_forward
    from segmantic_tpu.models.unet import UNet

    print("backend:", jax.default_backend(), flush=True)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    for B in (8, 16):
        x = jnp.zeros((B, 96, 96, 96, 1), jnp.float32)
        variables = model.init(jax.random.key(0), x[:1], training=False)

        @jax.jit
        def flax_fwd(v, a):
            return model.apply(v, a.astype(jnp.bfloat16),
                               training=False).astype(jnp.float32)

        exec_fwd = make_eval_forward(model, jnp.bfloat16)

        results = {}
        for tag, fn in (("flax", flax_fwd), ("exec", exec_fwd),
                        ("flax2", flax_fwd), ("exec2", exec_fwd)):
            t = bench(fn, (variables, x))
            results[tag] = t
            print(f"B={B} {tag:6s} {t*1e3:7.2f} ms", flush=True)
        bf = min(results["flax"], results["flax2"])
        ef = min(results["exec"], results["exec2"])
        print(f"B={B} best-of: flax {bf*1e3:.2f} -> exec {ef*1e3:.2f} ms "
              f"({bf/ef:.2f}x)", flush=True)

        # correctness spot check on-device
        xr = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, 96, 96, 96, 1)).astype(np.float32))
        d = jnp.abs(flax_fwd(variables, xr) - exec_fwd(variables, xr))
        print(f"B={B} max|diff|={float(d.max()):.4f} "
              f"mean|diff|={float(d.mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
