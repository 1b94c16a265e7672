"""A/B: XLA conv vs space-to-depth rewrites at the flagship hot shapes.

Interleaved in ONE script (the TPU pool is time-shared; cross-script
comparisons are meaningless). Run: python exp/fastconv_ab.py
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

    from segmantic_tpu.ops import fast_conv

    print("backend:", jax.default_backend(), flush=True)
    B = 8
    dt = jnp.bfloat16
    key = jax.random.key(0)

    def triple(fn, x, w):
        """(fwd, dx, dw) times for a conv-like fn."""
        t_f = bench(jax.jit(fn), (x, w))

        def loss(xx, ww):
            return fn(xx, ww).astype(jnp.float32).sum()

        t_dx = bench(jax.jit(jax.grad(loss, argnums=0)), (x, w))
        t_dw = bench(jax.jit(jax.grad(loss, argnums=1)), (x, w))
        return t_f, t_dx, t_dw

    def show(name, base, new):
        tb, tn = sum(base) * 1e3, sum(new) * 1e3
        print(f"{name:<30s} base f/dx/dw {base[0]*1e3:6.2f}/{base[1]*1e3:6.2f}/"
              f"{base[2]*1e3:6.2f}  new {new[0]*1e3:6.2f}/{new[1]*1e3:6.2f}/"
              f"{new[2]*1e3:6.2f}   total {tb:6.1f} -> {tn:6.1f} ms "
              f"({tb/tn:4.2f}x)", flush=True)

    dn = ("NDHWC", "DHWIO", "NDHWC")

    # 1) e0 stride-2 stem 1->16 @96 (and its shortcut: same shape)
    x = jnp.zeros((B, 96, 96, 96, 1), dt)
    w = (jax.random.normal(key, (3, 3, 3, 1, 16), jnp.float32) * 0.1).astype(dt)
    base = triple(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (2, 2, 2), "SAME", dimension_numbers=dn), x, w)
    new = triple(lambda xx, ww: fast_conv.s2d_conv(xx, ww), x, w)
    show("e0 s2 1->16 @96 (s2d)", base, new)

    # 2) d0 res conv 8->8 @96 stride 1
    x = jnp.zeros((B, 96, 96, 96, 8), dt)
    w = (jax.random.normal(key, (3, 3, 3, 8, 8), jnp.float32) * 0.1).astype(dt)
    base = triple(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1, 1), "SAME", dimension_numbers=dn), x, w)
    new = triple(lambda xx, ww: fast_conv.s2d_conv_s1(xx, ww), x, w)
    show("d0 res 8->8 @96 (s2d-s1)", base, new)

    # 3) d0 convT 32->8 @48->96
    x = jnp.zeros((B, 48, 48, 48, 32), dt)
    w = (jax.random.normal(key, (3, 3, 3, 32, 8), jnp.float32) * 0.1).astype(dt)
    base = triple(lambda xx, ww: jax.lax.conv_transpose(
        xx, ww, (2, 2, 2), "SAME", dimension_numbers=dn), x, w)
    new = triple(lambda xx, ww: fast_conv.subpixel_conv_transpose(xx, ww), x, w)
    show("d0 convT 32->8 @48->96 (subpix)", base, new)

    # 4) d1 convT 64->16 @24->48 (marginal case — check the gate)
    x = jnp.zeros((B, 24, 24, 24, 64), dt)
    w = (jax.random.normal(key, (3, 3, 3, 64, 16), jnp.float32) * 0.1).astype(dt)
    base = triple(lambda xx, ww: jax.lax.conv_transpose(
        xx, ww, (2, 2, 2), "SAME", dimension_numbers=dn), x, w)
    new = triple(lambda xx, ww: fast_conv.subpixel_conv_transpose(xx, ww), x, w)
    show("d1 convT 64->16 @24->48 (subpix)", base, new)

    # 5) d2 convT 128->32 @12->24 (expanded co=256 > 128: gate says no; verify)
    x = jnp.zeros((B, 12, 12, 12, 128), dt)
    w = (jax.random.normal(key, (3, 3, 3, 128, 32), jnp.float32) * 0.1).astype(dt)
    base = triple(lambda xx, ww: jax.lax.conv_transpose(
        xx, ww, (2, 2, 2), "SAME", dimension_numbers=dn), x, w)
    new = triple(lambda xx, ww: fast_conv.subpixel_conv_transpose(xx, ww), x, w)
    show("d2 convT 128->32 @12->24", base, new)

    # 6) grouped-conv batch packing probe for d0 res (XLA alternative)
    x = jnp.zeros((B, 96, 96, 96, 8), dt)
    w = (jax.random.normal(key, (3, 3, 3, 8, 8), jnp.float32) * 0.1).astype(dt)

    def grouped(xx, ww):
        xt = jnp.transpose(xx, (1, 2, 3, 0, 4)).reshape(1, 96, 96, 96, B * 8)
        wt = jnp.tile(ww, (1, 1, 1, 1, B))  # (3,3,3,8,64) groups of 8->8
        y = jax.lax.conv_general_dilated(
            xt, wt, (1, 1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=B)
        return jnp.transpose(y.reshape(96, 96, 96, B, 8), (3, 0, 1, 2, 4))

    t = triple(grouped, x, w)
    print(f"grouped-pack d0 8->8 @96: f/dx/dw "
          f"{t[0]*1e3:6.2f}/{t[1]*1e3:6.2f}/{t[2]*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
