"""A/B for the phase-space d0 conv (8,48^3,64)->64: XLA vs Pallas variants.

Variants: XLA conv; packed pallas whole-batch (BC=512, needs bigger VMEM
budget); packed pallas split-batch (2x BC=256). Interleaved.
Run: python exp/phaseconv_ab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench(fn, args, n=20, rounds=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmantic_tpu.ops import pallas_conv

    print("backend:", jax.default_backend(), flush=True)
    B, S, C = 8, 48, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, S, S, C)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, C, C)), jnp.bfloat16)

    @jax.jit
    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def pallas_full(x, w):
        return pallas_conv.conv3d_pallas(x, w)

    @jax.jit
    def pallas_split(x, w):
        a = pallas_conv.conv3d_pallas(x[:4], w)
        b = pallas_conv.conv3d_pallas(x[4:], w)
        return jnp.concatenate([a, b], axis=0)

    variants = [("xla", xla_conv), ("p_split", pallas_split)]
    try:
        pallas_full(x, w)
        variants.append(("p_full", pallas_full))
    except Exception as e:
        print("p_full unavailable:", str(e)[:120], flush=True)

    res = {}
    for rep in ("", "2"):
        for name, fn in variants:
            t = bench(fn, (x, w))
            res[name + rep] = t
            print(f"{name+rep:10s} {t*1e3:7.2f} ms", flush=True)
    base = min(res["xla"], res["xla2"])
    for name, _ in variants[1:]:
        v = min(res[name], res[name + "2"])
        print(f"{name}: {base/v:.2f}x vs xla", flush=True)

    # correctness
    ref = np.asarray(xla_conv(x, w), np.float32)
    got = np.asarray(pallas_split(x, w), np.float32)
    print("split max|d|:", float(np.abs(ref - got).max()), flush=True)


if __name__ == "__main__":
    main()
