"""Train-step voxels/s at batch 8 vs 16 vs 32 (same production step).

The bench's effective batch 8 mirrors the reference config; larger
batches may amortize fixed costs. Interleaved. Run: python exp/batch_sweep.py
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
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    print("backend:", jax.default_backend(), flush=True)
    BATCHES = tuple(int(b) for b in sys.argv[1:]) or (32, 96, 128)
    patch = (96, 96, 96)
    margin = tuple(p + 48 for p in patch)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1,) + patch + (1,)), training=False)
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    step = make_train_step(model, opt,
                           AugmentConfig(spatial=True, intensity=True),
                           patch, mixed_precision=True)
    rng = np.random.default_rng(0)
    vox = int(np.prod(patch))

    def bench(B, n=6, rounds=3):
        img = jnp.asarray(rng.standard_normal((B,) + margin + (1,)), jnp.bfloat16)
        lbl = jnp.asarray(rng.integers(0, 8, (B,) + margin), jnp.uint8)
        p = jax.tree_util.tree_map(jnp.array, variables["params"])
        b = jax.tree_util.tree_map(jnp.array, variables.get("batch_stats", {}))
        o = opt.init(p)
        key = jax.random.key(1)
        p, b, o, loss = step(p, b, o, img, lbl, key)
        float(loss)
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                key, sub = jax.random.split(key)
                p, b, o, loss = step(p, b, o, img, lbl, sub)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    res = {}
    for rep in ("", "2"):
        for B in BATCHES:
            t = bench(B)
            res[(B, rep)] = t
            print(f"B={B:3d}{rep:1s} {t*1e3:8.2f} ms  "
                  f"{B*vox/t/1e6:7.1f} Mvox/s", flush=True)
    for B in BATCHES:
        t = min(res[(B, "")], res[(B, "2")])
        print(f"best B={B}: {B*vox/t/1e6:.1f} Mvox/s", flush=True)


if __name__ == "__main__":
    main()
