"""A/B: separate stem + shortcut strided convs vs one fused conv (train).

e0's first subunit conv and residual projection both convolve the SAME
input (8,96^3,1) with stride-2 3^3 kernels. Fused = one conv with
concatenated output channels. Times fwd and fwd+grads for both, plus the
e1 pair (16->32 @48^3). Run: python exp/stemfuse_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench(fn, args, n=15, rounds=3):
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

    from segmantic_tpu.ops import fast_conv

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for tag, (B, S, Ci, Co) in (
        ("e0 1->16 @96", (8, 96, 1, 16)),
        ("e1 16->32 @48", (8, 48, 16, 32)),
    ):
        x = jnp.asarray(rng.standard_normal((B, S, S, S, Ci)), jnp.bfloat16)
        k1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, Ci, Co)), jnp.bfloat16)
        k2 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, Ci, Co)), jnp.bfloat16)
        b1 = jnp.zeros((Co,), jnp.bfloat16)
        b2 = jnp.zeros((Co,), jnp.bfloat16)

        def conv(x, k, b):
            if fast_conv.s2d_eligible(x.shape, (3, 3, 3), (2, 2, 2)):
                return fast_conv.s2d_conv(x, k, b)
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2, 2), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y + b

        def sep_loss(k1, k2, x):
            a = conv(x, k1, b1)
            c = conv(x, k2, b2)
            return jnp.sum((a + c).astype(jnp.float32) ** 2) * 1e-6

        def fused_loss(k1, k2, x):
            kc = jnp.concatenate([k1, k2], axis=-1)
            bc = jnp.concatenate([b1, b2])
            y = conv(x, kc, bc)
            a, c = y[..., :Co], y[..., Co:]
            return jnp.sum((a + c).astype(jnp.float32) ** 2) * 1e-6

        sep_f = jax.jit(lambda k1, k2, x: sep_loss(k1, k2, x))
        fus_f = jax.jit(lambda k1, k2, x: fused_loss(k1, k2, x))
        sep_g = jax.jit(jax.grad(sep_loss, argnums=(0, 1)))
        fus_g = jax.jit(jax.grad(fused_loss, argnums=(0, 1)))

        res = {}
        for rep in ("", "2"):
            for name, fn in (("sep_f", sep_f), ("fus_f", fus_f),
                             ("sep_g", sep_g), ("fus_g", fus_g)):
                t = bench(fn, (k1, k2, x))
                res[name + rep] = t
                print(f"{tag:14s} {name+rep:8s} {t*1e3:7.2f} ms", flush=True)
        for kind in ("f", "g"):
            s = min(res[f"sep_{kind}"], res[f"sep_{kind}2"])
            f = min(res[f"fus_{kind}"], res[f"fus_{kind}2"])
            print(f"{tag:14s} {kind}: sep {s*1e3:.2f} -> fus {f*1e3:.2f} "
                  f"({s/f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
