"""Sliding-window batch-size sweep: whole-volume time at sw_batch 4/8/16.

Bigger window batches amortize dispatch and fill the packed-conv lanes
(B*C = 8*8 = 64 at sw=8 for the 8-class head). Interleaved best-of.
Run: python exp/swbatch_ab.py
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

    from segmantic_tpu.infer.sliding_window import sliding_window_inference
    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.trainer import make_val_forward

    print("backend:", jax.default_backend(), flush=True)
    vol_shape = (256, 256, 176)
    roi = (96, 96, 96)
    num_classes = 8
    model = UNet(spatial_dims=3, in_channels=1, out_channels=num_classes)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + roi + (1,), jnp.bfloat16),
        training=False)
    forward = make_val_forward(model)

    def predictor(windows):
        return forward(variables, windows)

    rng = np.random.default_rng(0)
    volume = rng.standard_normal(vol_shape + (1,)).astype(np.float32)

    sws = (16, 32, 64)
    # warmup all variants first (compiles out of the timed region)
    for sw in sws:
        out = sliding_window_inference(
            volume, roi, sw, predictor, overlap=0.25, num_classes=num_classes)
        float(jnp.sum(out))

    best = {sw: float("inf") for sw in sws}
    for _ in range(4):
        for sw in sws:
            t0 = time.perf_counter()
            out = sliding_window_inference(
                volume, roi, sw, predictor, overlap=0.25,
                num_classes=num_classes)
            float(jnp.sum(out))
            best[sw] = min(best[sw], time.perf_counter() - t0)
    for sw in sws:
        print(f"sw_batch {sw:3d}: {best[sw]*1e3:8.1f} ms/volume "
              f"({60.0/best[sw]:.1f} vols/min)", flush=True)


if __name__ == "__main__":
    main()
