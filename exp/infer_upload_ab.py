"""A/B: sliding-window inference upload strategies (VERDICT r2 #4).

End-to-end inference is upload-bound through the TPU tunnel (45 MB/volume
f32): 51.8 vols/min vs 212.8 device-resident (BASELINE.md). Variants, all
interleaved in ONE script (tunnel timing rule):

  a) current: jnp.asarray(f32 volume), scanned runner
  b) bf16 wire: cast the host volume to bf16 before upload (half the bytes;
     the model consumes bf16 windows anyway)
  c) bf16 wire + slab-pipelined upload: upload axis-0 slabs just ahead of
     the window chunks that need them (async dispatch overlaps wire with
     device compute)
  d) device-resident floor (volume pre-staged)

Run on the real chip: python exp/infer_upload_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from segmantic_tpu.infer.sliding_window import sliding_window_inference
from segmantic_tpu.models.unet import UNet
from segmantic_tpu.train.trainer import make_val_forward

VOL = (256, 256, 176)
ROI = (96, 96, 96)
NCLS = 8
SWB = 16


def main() -> None:
    model = UNet(spatial_dims=3, in_channels=1, out_channels=NCLS)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + ROI + (1,), jnp.bfloat16), training=False
    )
    forward = make_val_forward(model)

    def predictor(windows):
        return forward(variables, windows)

    rng = np.random.default_rng(0)
    vol_f32 = rng.standard_normal(VOL + (1,)).astype(np.float32)
    vol_bf16 = vol_f32.astype(ml_dtypes.bfloat16)

    def run(vol, **kw):
        out = sliding_window_inference(
            vol, ROI, SWB, predictor, overlap=0.25, num_classes=NCLS, **kw
        )
        return float(jnp.sum(out))  # host-transfer fence

    variants = {
        "a_f32_blob": lambda: run(vol_f32, upload_pipeline=False),
        "b_bf16_blob": lambda: run(vol_bf16, upload_pipeline=False),
        "c_bf16_pipeline": lambda: run(vol_bf16, upload_pipeline=True),
        "d_device_resident": lambda: run(jnp.asarray(vol_bf16)),
    }

    # warm up all compilations
    sums = {k: f() for k, f in variants.items()}
    print("checksums:", {k: round(v, 1) for k, v in sums.items()})

    best = {k: float("inf") for k in variants}
    N = 6
    for _ in range(N):
        for k, f in variants.items():  # interleaved
            t0 = time.perf_counter()
            f()
            best[k] = min(best[k], time.perf_counter() - t0)

    for k, t in best.items():
        print(f"{k:20s} {t * 1e3:8.1f} ms  {60.0 / t:7.1f} vols/min")


if __name__ == "__main__":
    main()
