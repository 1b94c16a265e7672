"""Split the intensity-augmentation cost at batch B: full intensity vs
FFT augs off (gibbs/spike prob 0) vs pointwise zoo off.
Run: python exp/intensity_split.py [B]
"""

from __future__ import annotations

import dataclasses
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

    from segmantic_tpu.train.augment import AugmentConfig, augment_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    S = 96
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, S, S, S, 1)), jnp.bfloat16)
    lbl = jnp.asarray(rng.integers(0, 8, (B, S, S, S)), jnp.uint8)

    base = AugmentConfig(spatial=False, intensity=True)
    cfgs = {
        "full": base,
        "no_fft": dataclasses.replace(base, gibbs_prob=0.0, spike_prob=0.0),
        "fft_only": dataclasses.replace(
            base, contrast_prob=0.0, hist_shift_prob=0.0, bias_prob=0.0),
    }
    fns = {
        k: jax.jit(lambda i, l, kk, c=c: augment_batch(i, l, kk, c, (S,) * 3))
        for k, c in cfgs.items()
    }

    def bench(fn, n=6, rounds=3):
        out = fn(img, lbl, jax.random.key(1))[0]
        float(out.ravel()[0].astype(jnp.float32))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(img, lbl, jax.random.key(1))[0]
            float(out.ravel()[0].astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    for fn in fns.values():
        bench(fn, n=1, rounds=1)
    best = {k: float("inf") for k in fns}
    for _ in range(3):
        for k, fn in fns.items():
            best[k] = min(best[k], bench(fn))
    for k, v in best.items():
        print(f"{k:>9s}: {v*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
