"""Secondary benchmark: sliding-window inference throughput (vols/min/chip).

Runs the flagship 3D residual UNet over a typical head-MRI-sized volume
(256x256x176, 8 classes) with roi 96^3, sw-batch 16 (swept in exp/swbatch_ab.py), overlap 0.25, Gaussian blending —
Pallas blend kernel on TPU — and prints one JSON line with volumes/minute
per chip. (The driver's headline bench is bench.py; this one documents the
inference-side number from BASELINE.md.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.infer.sliding_window import sliding_window_inference
    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.trainer import make_val_forward

    vol_shape = (256, 256, 176)
    roi = (96, 96, 96)
    num_classes = 8

    # SEGMANTIC_BENCH_ARCH=segresnet|unetr benches the other architectures
    # through the same production predict path (the executor rewrites are
    # UNet-gated and fall back to module.apply for these — documented in
    # BASELINE.md). UNETR windows must run at roi == its init spatial size
    # (pos embedding ties params to the token grid), which roi 96^3 is.
    arch = os.environ.get("SEGMANTIC_BENCH_ARCH", "unet").lower()
    if arch == "segresnet":
        from segmantic_tpu.models.segresnet import SegResNet

        model = SegResNet(spatial_dims=3, in_channels=1,
                          out_channels=num_classes, init_filters=8)
    elif arch == "unetr":
        from segmantic_tpu.models.unetr import UNETR

        model = UNETR(in_channels=1, out_channels=num_classes)
    else:
        model = UNet(spatial_dims=3, in_channels=1, out_channels=num_classes)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + roi + (1,), jnp.bfloat16), training=False
    )

    # the production predictor construction: routes through the packed-
    # layout executor (folded norms, phase-space top stage) when supported
    forward = make_val_forward(model)

    def predictor(windows):
        return forward(variables, windows)

    rng = np.random.default_rng(0)
    volume = rng.standard_normal(vol_shape + (1,)).astype(np.float32)

    # production wire: bf16 (exact for the bf16 forward — windows are cast
    # on device anyway) + slab-pipelined upload; exp/infer_upload_ab.py
    # measured f32 blob 1080 ms vs bf16 617 ms == device-resident 621 ms
    wire = dict(wire_dtype=jnp.bfloat16)

    # warmup (compile)
    out = sliding_window_inference(
        volume, roi, 16, predictor, overlap=0.25, num_classes=num_classes, **wire
    )
    float(jnp.sum(out))

    def best_of(vol, n=5, **extra):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = sliding_window_inference(
                vol, roi, 16, predictor, overlap=0.25, num_classes=num_classes,
                **(wire if isinstance(vol, np.ndarray) else {}), **extra
            )
            float(jnp.sum(out))  # host-transfer fence (tunnel rule)
            best = min(best, time.perf_counter() - t0)
        return best

    best = best_of(volume)
    # device-resident variant: volume pre-staged, isolates compute from the
    # host->device link (the tunnel here runs ~45 MB/volume at fluctuating
    # bandwidth; PCIe-local hardware uploads the same volume in ~ms)
    dev_extra = {}
    try:
        best_dev = best_of(jnp.asarray(volume))
    except Exception:
        # the scanned runner emits ONE program over all full chunks; for deep
        # models (UNETR: 12 transformer layers) its serialized HLO can exceed
        # the tunnel's remote-compile request limit (HTTP 413). Fall back to
        # the per-chunk jit — the same predictor program the pipelined
        # end-to-end path runs — and record that the scan was off.
        dev_extra = {"device_resident_scan": False}
        best_dev = best_of(jnp.asarray(volume), scan_chunks=False)

    vols_per_min = 60.0 / best
    result = {
        "metric": "sliding_window_vols_per_min_per_chip",
        "value": round(vols_per_min, 2),
        "unit": "volumes(256x256x176)/min/chip",
        "seconds_per_volume": round(best, 3),
        "device_resident_vols_per_min": round(60.0 / best_dev, 2),
        **dev_extra,
    }
    if arch != "unet":
        result["arch"] = arch
    print(json.dumps(result))


if __name__ == "__main__":
    main()
