"""TPU validation of the i2i family (VERDICT r3 #5): pix2pix and CycleGAN
on synthetic T1/T2-like 2D slices — training throughput + converging
losses on the real chip, recorded in BASELINE.md.

Synthetic task: "anatomy" is a smooth random field (bilinear-upsampled
low-res noise); T1 = anatomy, T2 = a monotone nonlinear intensity remap
(-tanh(1.5 a)) + noise. pix2pix trains on PAIRED (T1, T2) slices of the
same anatomy; CycleGAN trains on UNPAIRED domains (different seeds).
This mirrors the reference's advertised T1->T2 use
(reference: docs/index.md:10,42) with a checkable ground truth.

Each family runs twice: a 3-step warmup (fills the persistent compile
cache) and a timed run — the timed number therefore includes the
per-step put_batch host->device wire, i.e. end-to-end training speed.

Run: python exp/i2i_tpu.py [pix2pix|cyclegan|both]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

SIZE_P2P, BATCH_P2P, STEPS_P2P = 192, 8, 300
SIZE_CG, BATCH_CG, STEPS_CG = 128, 4, 200


def _anatomy(rng, n: int, size: int) -> np.ndarray:
    """Smooth random field in [-1, 1]: low-res noise, bilinear upsample."""
    from scipy.ndimage import zoom

    low = rng.standard_normal((n, size // 16, size // 16)).astype(np.float32)
    up = np.stack([zoom(s, 16, order=1) for s in low])
    up /= max(np.abs(up).max(), 1e-6)
    return up[..., None]


def _t2(anatomy: np.ndarray, rng) -> np.ndarray:
    return (-np.tanh(1.5 * anatomy)
            + 0.05 * rng.standard_normal(anatomy.shape)).astype(np.float32)


def run_pix2pix() -> dict:
    from segmantic_tpu.i2i.train import train_pix2pix

    rng = np.random.default_rng(0)
    pool_a = _anatomy(rng, 64, SIZE_P2P)
    pool_b = _t2(pool_a, rng)

    def batches(n):
        r = np.random.default_rng(1)
        for _ in range(n):
            idx = r.integers(0, len(pool_a), BATCH_P2P)
            yield pool_a[idx], pool_b[idx]

    with tempfile.TemporaryDirectory() as td:
        train_pix2pix(batches(3), steps=3, output_dir=None)  # compile warm
        t0 = time.perf_counter()
        result = train_pix2pix(
            batches(STEPS_P2P), steps=STEPS_P2P, output_dir=Path(td),
            log_every=50,
        )
        dt = time.perf_counter() - t0
    l1_first, l1_last = result.history[0]["l1"], result.history[-1]["l1"]
    mpix = BATCH_P2P * SIZE_P2P * SIZE_P2P * STEPS_P2P / dt / 1e6
    out = {
        "family": "pix2pix", "size": SIZE_P2P, "batch": BATCH_P2P,
        "steps": STEPS_P2P, "steps_per_s": round(STEPS_P2P / dt, 2),
        "mpix_per_s": round(mpix, 1), "l1_first": round(l1_first, 4),
        "l1_last": round(l1_last, 4),
        "converged": bool(l1_last < 0.5 * l1_first),
    }
    print("PIX2PIX_TPU", out, flush=True)
    return out


def run_cyclegan() -> dict:
    from segmantic_tpu.i2i.train import train_cyclegan

    rng = np.random.default_rng(0)
    pool_a = _anatomy(rng, 48, SIZE_CG)  # unpaired: independent anatomies
    pool_b = _t2(_anatomy(np.random.default_rng(7), 48, SIZE_CG), rng)

    def batches(n):
        r = np.random.default_rng(2)
        for _ in range(n):
            yield (pool_a[r.integers(0, len(pool_a), BATCH_CG)],
                   pool_b[r.integers(0, len(pool_b), BATCH_CG)])

    with tempfile.TemporaryDirectory() as td:
        train_cyclegan(batches(3), steps=3, output_dir=None)  # compile warm
        t0 = time.perf_counter()
        result = train_cyclegan(
            batches(STEPS_CG), steps=STEPS_CG, output_dir=Path(td),
            log_every=25,
        )
        dt = time.perf_counter() - t0
    cyc_first = result.history[0]["cycle"]
    cyc_last = result.history[-1]["cycle"]
    finite = all(np.isfinite(r["g_loss"]) and np.isfinite(r["d_loss"])
                 for r in result.history)
    out = {
        "family": "cyclegan", "size": SIZE_CG, "batch": BATCH_CG,
        "steps": STEPS_CG, "steps_per_s": round(STEPS_CG / dt, 2),
        "mpix_per_s": round(
            BATCH_CG * SIZE_CG * SIZE_CG * STEPS_CG / dt / 1e6, 1),
        "cycle_first": round(cyc_first, 4), "cycle_last": round(cyc_last, 4),
        "losses_finite": finite,
        "converged": bool(finite and cyc_last < 0.7 * cyc_first),
    }
    print("CYCLEGAN_TPU", out, flush=True)
    return out


def main():
    import jax

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend(), flush=True)
    if which in ("pix2pix", "both"):
        run_pix2pix()
    if which in ("cyclegan", "both"):
        run_cyclegan()


if __name__ == "__main__":
    main()
