"""A/B at production shapes: expanded-k3 XLA phase conv vs the Pallas
implicit-GEMM custom-VJP op (ops/phase_gemm.phase_conv) — fwd and
fwd+bwd, interleaved, bf16, host-transfer fenced.

Run: python exp/phasegemm_vjp_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench(fn, args, n=10, rounds=1):
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

        def mk(conv):
            fwd = jax.jit(conv)
            fb = jax.jit(jax.grad(
                lambda p, w, g: jnp.sum(conv(p, w).astype(jnp.float32)
                                        * g.astype(jnp.float32)),
                argnums=(0, 1)))
            return fwd, fb

        f_x, fb_x = mk(k3)
        f_p, fb_p = mk(lambda p, w: pg.phase_conv(p, w))
        dw_p = jax.jit(lambda p, g, w: pg.phase_conv_gemm_dw(p, g, w))

        # numerics once (cheap case only)
        if B == 32:
            ax, aw = fb_x(p, w, g)
            bx, bw = fb_p(p, w, g)
            ex = float(jnp.max(jnp.abs(ax.astype(jnp.float32)
                                       - bx.astype(jnp.float32))))
            ew = float(jnp.max(jnp.abs(aw.astype(jnp.float32)
                                       - bw.astype(jnp.float32)))
                       / (float(jnp.max(jnp.abs(aw))) + 1e-9))
            print(f"  numerics: max|dp| delta {ex:.3e}, rel dw {ew:.3e}",
                  flush=True)

        tfx = tfp = tbx = tbp = tdw = float("inf")
        for _ in range(3):
            tfx = min(tfx, bench(f_x, (p, w)))
            tfp = min(tfp, bench(f_p, (p, w)))
            tbx = min(tbx, bench(fb_x, (p, w, g), n=6))
            tbp = min(tbp, bench(fb_p, (p, w, g), n=6))
            tdw = min(tdw, bench(dw_p, (p, g, w)))
        print(
            f"{name}: fwd XLA {tfx*1e3:7.2f}  pallas {tfp*1e3:7.2f} "
            f"({tfx/tfp:4.2f}x) | fwd+bwd XLA {tbx*1e3:7.2f}  "
            f"pallas {tbp*1e3:7.2f} ({tbx/tbp:4.2f}x) | "
            f"pallas dw-only {tdw*1e3:7.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
