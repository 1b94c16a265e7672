"""Host-pipeline scaling: C++ batched cropper latency vs thread count.

VERDICT r2 #5: the true-pipeline gap (bench_pipeline 8.55M vs device 259M
vox/s/chip) was attributed to the 1-core host + tunnel; this measures the
claim's host half. Each thread count runs in a fresh subprocess (the native
pool cap SEGMANTIC_NATIVE_THREADS is latched once per process) over a
production-shaped workload: batch 96 margin patches (144^3 = patch 96 + 2x24 margin, bf16 wire +
uint8 labels) from a 256^3 volume.

On this 1-core box counts > 1 can only tie (timeslicing) — the number that
matters is the single-thread rate, which extrapolates linearly because the
kernel is a lock-free parallel_for over batch items (each thread writes a
disjoint output slice; measured tie at >1 thread confirms no contention
overhead). Run: python exp/cropper_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import time, numpy as np, sys
sys.path.insert(0, %r)
from segmantic_tpu import native
rng = np.random.default_rng(0)
img = rng.standard_normal((1, 256, 256, 256)).astype(np.float32)
lbl = rng.integers(0, 8, (256, 256, 256)).astype(np.uint8)
B, M = 96, 144
starts = rng.integers(-8, 256 - M + 8, (B, 3)).astype(np.int64)
# warm (page in)
native.crop_patches_3d(img, lbl, starts[:4], (M, M, M), to_bf16=True)
best = 9e9
for _ in range(5):
    t0 = time.perf_counter()
    native.crop_patches_3d(img, lbl, starts, (M, M, M), to_bf16=True)
    best = min(best, time.perf_counter() - t0)
vox = B * M ** 3
print(f"{best:.4f} {vox}")
"""


def main() -> None:
    results = {}
    for n in (1, 2, 4, 8):
        env = dict(os.environ, SEGMANTIC_NATIVE_THREADS=str(n))
        out = subprocess.run(
            [sys.executable, "-c", WORKER % str(REPO)],
            capture_output=True, text=True, env=env, timeout=600,
        )
        sec, vox = out.stdout.split()
        results[n] = (float(sec), int(vox))
        print(f"threads={n}: {float(sec) * 1e3:8.1f} ms/batch  "
              f"{int(vox) / float(sec) / 1e6:7.1f} Mvox/s")
    one = results[1]
    print(json.dumps({
        "single_thread_Mvox_per_s": round(one[1] / one[0] / 1e6, 1),
        "batch96_144cubed_ms_at_1_thread": round(one[0] * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
