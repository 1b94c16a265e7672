"""A/B: encoder stage-0 stride-1 conv (3^3, 16->16 @ 32x48^3 bf16) plain
XLA vs block-space s2d_conv_s1 (dense 128 lanes, 8x structural-zero FLOPs,
two relayouts) — fwd and fwd+bwd, interleaved best-of.

If s2d wins big here, the whole encoder stage should stay block-space
(killing the per-conv relayouts too). Run: python exp/e0_s2d_ab.py
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

    from segmantic_tpu.ops import fast_conv

    B, S, C = 32, 48, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, S, S, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1, jnp.bfloat16)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def plain(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1, 1), "SAME", dimension_numbers=dn)

    def s2d(xx, ww):
        return fast_conv.s2d_conv_s1(xx, ww)

    # phase-resident: input/output stay in block space (what a full
    # block-space stage would see — no per-conv relayouts)
    xp = fast_conv.space_to_depth(x)

    def phase_only(pp, ww):
        return fast_conv.phase_conv_s1(pp, ww)

    def loss_of(fn):
        def f(xx, ww):
            return jnp.sum(fn(xx, ww).astype(jnp.float32) ** 2)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    fwds = {
        "plain_f": jax.jit(plain),
        "s2d_f": jax.jit(s2d),
        "phase_f": jax.jit(phase_only),
    }
    bwds = {
        "plain_fb": loss_of(plain),
        "s2d_fb": loss_of(s2d),
        "phase_fb": loss_of(phase_only),
    }

    # equivalence
    np.testing.assert_allclose(
        np.asarray(s2d(x, w), np.float32),
        np.asarray(plain(x, w), np.float32), atol=2e-2, rtol=2e-2)

    def bench(fn, args, n=20, rounds=3):
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
              .astype(jnp.float32))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
                  .astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    timers = {}
    for k, fn in fwds.items():
        timers[k] = (fn, (xp if k.startswith("phase") else x, w))
    for k, fn in bwds.items():
        timers[k] = (fn, (xp if k.startswith("phase") else x, w))
    for fn, args in timers.values():
        bench(fn, args, n=1, rounds=1)
    best = {k: float("inf") for k in timers}
    for _ in range(3):
        for k, (fn, args) in timers.items():
            best[k] = min(best[k], bench(fn, args))
    for k, v in best.items():
        print(f"{k:>9s}: {v*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
