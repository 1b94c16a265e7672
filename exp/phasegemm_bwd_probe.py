"""Phase-conv BACKWARD breakdown at production shapes (VERDICT r2 #6/#1).

XLA's expanded-k3 phase conv costs ~22 ms fwd / ~54 ms bwd at b96-d0.
This probe splits the bwd into dx-only and dw-only (linear-in-input conv:
grad of sum(f*g) DCEs the unused forward), and times the Pallas
implicit-GEMM kernel (ops/phase_gemm.py) as BOTH the fwd and the dx
candidate — dx of a SAME k3 conv IS the same conv with the spatially
flipped, io-transposed kernel, so the fwd kernel doubles as dx.

Interleaved, bf16, host-transfer fenced. Run: python exp/phasegemm_bwd_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench(fn, args, n=15, rounds=1):
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
    from segmantic_tpu.ops import phase_gemm as pg

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def k3(p, w):
        wsub = fc.expand_s1_kernel(w)
        return jax.lax.conv_general_dilated(
            p, wsub.astype(p.dtype), window_strides=(1, 1, 1),
            padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    cases = [
        ("d0 b96", 96, 48, 8),
        ("d1 b96", 96, 24, 16),
        ("d0 b32", 32, 48, 8),
    ]
    for name, B, S, C in cases:
        p = jnp.asarray(rng.standard_normal((B, S, S, S, 8 * C)), jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, C, C)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, S, S, S, 8 * C)), jnp.bfloat16)
        wT = jnp.flip(w, (0, 1, 2)).swapaxes(-1, -2)

        fwd = jax.jit(k3)
        dx = jax.jit(jax.grad(
            lambda p, w, g: jnp.sum(k3(p, w).astype(jnp.float32)
                                    * g.astype(jnp.float32)), argnums=0))
        dw = jax.jit(jax.grad(
            lambda p, w, g: jnp.sum(k3(p, w).astype(jnp.float32)
                                    * g.astype(jnp.float32)), argnums=1))
        pgf = jax.jit(lambda p, w: pg.phase_conv_gemm(p, w))

        # numerics: pallas(g, flipped wT) == XLA dx (small case only — the
        # b96 arrays would double peak HBM for a check done once)
        if B == 32:
            a = dx(p, w, g).astype(jnp.float32)
            b = pgf(g, wT).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        else:
            err = float("nan")

        tf = tx = tw = tp = float("inf")
        for _ in range(3):
            tf = min(tf, bench(fwd, (p, w)))
            tx = min(tx, bench(dx, (p, w, g)))
            tw = min(tw, bench(dw, (p, w, g)))
            tp = min(tp, bench(pgf, (g, wT)))
        print(
            f"{name}: XLA fwd {tf*1e3:7.2f}  dx {tx*1e3:7.2f}  "
            f"dw {tw*1e3:7.2f} ms | pallas-as-dx {tp*1e3:7.2f} ms "
            f"({tx/tp:4.2f}x vs XLA dx) | dx rel err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
