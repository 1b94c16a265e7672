"""Backward-pass breakdown: which gradient ops make bwd ~4x the forward?

The flagship step spends ~145-155 ms in fwd+bwd vs ~30 ms fwd (exp/mfu_probe).
This probe times the REAL op list of the flagship UNet (every conv /
conv_transpose at its true stage shape, fwd, dx, dw separately) with n>=20
amortization (the tunnel's host-transfer fence costs ~25 ms, so small-op
timings with few calls are fence-dominated garbage), plus a channel-first
(NCDHW) layout A/B: at tiny C the lane dim (C) wastes the MXU/VPU, while
channel-first puts W=96 in lanes. Run ad hoc: python exp/bwd_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V5E_BF16_PEAK = 197e12


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

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B = 8
    dt = jnp.bfloat16
    key = jax.random.key(0)

    def conv_last(x, w, stride=1):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,) * 3, padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv_first(x, w, stride=1):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,) * 3, padding="SAME",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))

    def convT_last(x, w, stride=2):
        return jax.lax.conv_transpose(
            x, w, strides=(stride,) * 3, padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    # The REAL flagship op list (encoder + bottom + decoder), B=8.
    # (name, spatial_in, cin, cout, stride)
    convs = [
        ("e0 conv s2 1->16 @96", 96, 1, 16, 2),
        ("e0 conv 16->16 @48", 48, 16, 16, 1),
        ("e0 short s2 1->16 @96", 96, 1, 16, 2),   # kernel 3 shortcut
        ("e1 conv s2 16->32 @48", 48, 16, 32, 2),
        ("e1 conv 32->32 @24", 24, 32, 32, 1),
        ("e2 conv s2 32->64 @24", 24, 32, 64, 2),
        ("e2 conv 64->64 @12", 12, 64, 64, 1),
        ("e3 conv s2 64->128 @12", 12, 64, 128, 2),
        ("e3 conv 128->128 @6", 6, 128, 128, 1),
        ("bot conv 128->256 @6", 6, 128, 256, 1),
        ("bot conv 256->256 @6", 6, 256, 256, 1),
        ("d3 res 64->64 @12", 12, 64, 64, 1),
        ("d2 res 32->32 @24", 24, 32, 32, 1),
        ("d1 res 16->16 @48", 48, 16, 16, 1),
        ("d0 res 8->8 @96", 96, 8, 8, 1),
    ]
    convTs = [
        ("d3 convT 384->64 @6->12", 6, 384, 64),
        ("d2 convT 128->32 @12->24", 12, 128, 32),
        ("d1 convT 64->16 @24->48", 24, 64, 16),
        ("d0 convT 32->8 @48->96", 48, 32, 8),
    ]

    tot = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
    print(f"{'op':<28s} {'fwd':>7s} {'dx':>7s} {'dw':>7s}   {'fwdCF':>7s}  (ms)")
    for name, sp, cin, cout, stride in convs:
        x = jnp.zeros((B, sp, sp, sp, cin), dt)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32) * 0.1).astype(dt)
        t_fwd = bench(jax.jit(lambda xx, ww, s=stride: conv_last(xx, ww, s)), (x, w))

        def loss(xx, ww, s=stride):
            return conv_last(xx, ww, s).astype(jnp.float32).sum()

        t_dx = bench(jax.jit(jax.grad(loss, argnums=0)), (x, w))
        t_dw = bench(jax.jit(jax.grad(loss, argnums=1)), (x, w))
        # channel-first A/B
        xf = jnp.zeros((B, cin, sp, sp, sp), dt)
        t_cf = bench(jax.jit(lambda xx, ww, s=stride: conv_first(xx, ww, s)), (xf, w))
        tot["fwd"] += t_fwd
        tot["dx"] += t_dx
        tot["dw"] += t_dw
        print(f"{name:<28s} {t_fwd*1e3:7.2f} {t_dx*1e3:7.2f} {t_dw*1e3:7.2f}"
              f"   {t_cf*1e3:7.2f}", flush=True)

    for name, sp, cin, cout in convTs:
        x = jnp.zeros((B, sp, sp, sp, cin), dt)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32) * 0.1).astype(dt)
        t_fwd = bench(jax.jit(lambda xx, ww: convT_last(xx, ww)), (x, w))

        def lossT(xx, ww):
            return convT_last(xx, ww).astype(jnp.float32).sum()

        t_dx = bench(jax.jit(jax.grad(lossT, argnums=0)), (x, w))
        t_dw = bench(jax.jit(jax.grad(lossT, argnums=1)), (x, w))
        tot["fwd"] += t_fwd
        tot["dx"] += t_dx
        tot["dw"] += t_dw
        print(f"{name:<28s} {t_fwd*1e3:7.2f} {t_dx*1e3:7.2f} {t_dw*1e3:7.2f}", flush=True)

    print(f"{'TOTAL (standalone sum)':<28s} {tot['fwd']*1e3:7.2f} "
          f"{tot['dx']*1e3:7.2f} {tot['dw']*1e3:7.2f}", flush=True)

    # dice loss fwd+bwd at output shape
    from segmantic_tpu.train.losses import dice_loss

    logits = jnp.zeros((B, 96, 96, 96, 8), dt)
    label = jnp.zeros((B, 96, 96, 96), jnp.int32)
    t = bench(jax.jit(lambda l: dice_loss(l, label)), (logits,))
    tb = bench(jax.jit(jax.grad(lambda l: dice_loss(l, label))), (logits,))
    print(f"{'dice loss @96^3x8':<28s} {t*1e3:7.2f} {tb*1e3:7.2f}", flush=True)


if __name__ == "__main__":
    main()
