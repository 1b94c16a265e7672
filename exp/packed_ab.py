"""A/B: XLA stride-1 conv vs the differentiable batch-packed Pallas conv.

Interleaved in one script (time-shared pool). Run: python exp/packed_ab.py
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

    from segmantic_tpu.ops.pallas_conv import conv3d_packed, packed_vjp_supported

    print("backend:", jax.default_backend(), flush=True)
    B = 8
    dt = jnp.bfloat16
    key = jax.random.key(0)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def triple(fn, x, w):
        t_f = bench(jax.jit(fn), (x, w))

        def loss(xx, ww):
            return fn(xx, ww).astype(jnp.float32).sum()

        t_dx = bench(jax.jit(jax.grad(loss, argnums=0)), (x, w))
        t_dw = bench(jax.jit(jax.grad(loss, argnums=1)), (x, w))
        t_all = bench(jax.jit(jax.grad(loss, argnums=(0, 1))), (x, w))
        return t_f, t_dx, t_dw, t_all

    for name, sp, c, co in [
        ("d0 8->8 @96", 96, 8, 8),
        ("e0 16->16 @48", 48, 16, 16),
        ("e1 32->32 @24", 24, 32, 32),
    ]:
        x = jnp.zeros((B, sp, sp, sp, c), dt)
        w = (jax.random.normal(key, (3, 3, 3, c, co), jnp.float32) * 0.1).astype(dt)
        assert packed_vjp_supported(x.shape, co), name
        base = triple(lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, (1, 1, 1), "SAME", dimension_numbers=dn), x, w)
        new = triple(lambda xx, ww: conv3d_packed(xx, ww), x, w)
        tb, tn = base[0] + base[3], new[0] + new[3]
        print(f"{name:<16s} base f/dx/dw/dxw {base[0]*1e3:6.2f}/{base[1]*1e3:6.2f}/"
              f"{base[2]*1e3:6.2f}/{base[3]*1e3:6.2f}"
              f"  packed {new[0]*1e3:6.2f}/{new[1]*1e3:6.2f}/{new[2]*1e3:6.2f}/"
              f"{new[3]*1e3:6.2f}  f+dxw {tb*1e3:6.1f} -> {tn*1e3:6.1f} ms "
              f"({tb/tn:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
