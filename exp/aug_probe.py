"""Where do the augmentation milliseconds go? Spatial / intensity / FFT.

Run: python exp/aug_probe.py  (one interleaved script; tunnel-fenced)
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

    from segmantic_tpu.train.augment import AugmentConfig, augment_batch

    print("backend:", jax.default_backend(), flush=True)
    B = 8
    patch = (96, 96, 96)
    margin = tuple(p + 48 for p in patch)
    img = jnp.zeros((B,) + margin + (1,), jnp.float32)
    lbl = jnp.zeros((B,) + margin, jnp.int32)
    key = jax.random.key(0)

    variants = {
        "full (spatial+intensity)": AugmentConfig(spatial=True, intensity=True),
        "spatial only": AugmentConfig(spatial=True, intensity=False),
        "intensity only": AugmentConfig(spatial=False, intensity=True),
        "int. no-FFT": AugmentConfig(spatial=False, intensity=True,
                                     gibbs_prob=0.0, spike_prob=0.0),
        "crop+flip only": AugmentConfig(spatial=False, intensity=False),
    }
    for name, cfg in variants.items():
        f = jax.jit(lambda i, l, k, c=cfg: augment_batch(i, l, k, c, patch))
        t = bench(f, (img, lbl, key))
        print(f"{name:<28s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
