"""A/B: phase-space stride-1 conv — expanded k3 (8x structural-zero FLOPs)
vs the half-block-shifted k2 re-phasing (3.375x FLOP cut, one relayout).

Shapes are the production phase stages of the flagship 3D UNet:
  d0 head:  (B, 48^3, 64 lanes)  = 8 feats  x 2^3 phases (96^3 full-res)
  d1 stage: (B, 24^3, 128 lanes) = 16 feats x 2^3 phases (48^3 full-res)

Interleaved, bf16, host-transfer fenced. Run: python exp/phase_k2_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

    from segmantic_tpu.ops import fast_conv as fc

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def k3(p, w):
        wsub = fc.expand_s1_kernel(w)
        return jax.lax.conv_general_dilated(
            p, wsub.astype(p.dtype), window_strides=(1, 1, 1),
            padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def k2(p, w):
        return fc.phase_conv_s1_k2(p, w)

    def loss_of(f):
        def g(p, w):
            return jnp.sum(f(p, w).astype(jnp.float32) ** 2)
        return g

    cases = [
        ("d0 b8", 8, 48, 8),
        ("d1 b8", 8, 24, 16),
        ("d0 b32", 32, 48, 8),
        ("d1 b32", 32, 24, 16),
    ]
    for name, B, S, C in cases:
        p = jnp.asarray(rng.standard_normal((B, S, S, S, 8 * C)), jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, C, C)), jnp.bfloat16)

        f3 = jax.jit(k3)
        f2 = jax.jit(k2)
        # numerics sanity (bf16 tolerance)
        a, b = f3(p, w).astype(jnp.float32), f2(p, w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        g3 = jax.jit(jax.grad(loss_of(k3), argnums=(0, 1)))
        g2 = jax.jit(jax.grad(loss_of(k2), argnums=(0, 1)))

        # interleave the variants within each measurement round
        t3f = t2f = t3g = t2g = float("inf")
        for _ in range(3):
            t3f = min(t3f, bench(f3, (p, w), rounds=1))
            t2f = min(t2f, bench(f2, (p, w), rounds=1))
            t3g = min(t3g, bench(g3, (p, w), n=10, rounds=1))
            t2g = min(t2g, bench(g2, (p, w), n=10, rounds=1))
        print(
            f"{name}: fwd k3 {t3f*1e3:7.2f} ms  k2 {t2f*1e3:7.2f} ms "
            f"({t3f/t2f:4.2f}x) | fwd+bwd k3 {t3g*1e3:7.2f} ms  "
            f"k2 {t2g*1e3:7.2f} ms ({t3g/t2g:4.2f}x) | rel err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
