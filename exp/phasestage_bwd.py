"""fwd / fwd+bwd of the two phase-space decoder stages at flagship shapes.

d1: (8,24^3,64) -> phase(16) -> conv_s1(16) -> d2s(48^3,16)
d0: (8,48^3,32) -> phase(8)  -> conv_s1(8)  -> d2s(96^3,8)
Run: python exp/phasestage_bwd.py
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

    for tag, (B, S, Ci, Co) in (("d1", (8, 24, 64, 16)), ("d0", (8, 48, 32, 8))):
        x = jnp.asarray(rng.standard_normal((B, S, S, S, Ci)), jnp.bfloat16)
        kt = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, Ci, Co)), jnp.bfloat16)
        ks = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, Co, Co)), jnp.bfloat16)

        def stage(kt, ks, x):
            ph = fast_conv.subpixel_phase_conv(x, kt)
            ph = jnp.where(ph >= 0, ph, 0.25 * ph)
            yp = fast_conv.phase_conv_s1(ph, ks)
            return fast_conv.depth_to_space(yp + ph, Co)

        def loss(kt, ks, x):
            return jnp.sum(stage(kt, ks, x).astype(jnp.float32) ** 2) * 1e-6

        f = jax.jit(loss)
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        # also: the two convs alone
        pc = jax.jit(lambda ks, p: fast_conv.phase_conv_s1(p, ks))
        ph0 = fast_conv.subpixel_phase_conv(x, kt)
        gpc = jax.jit(jax.grad(
            lambda ks, p: jnp.sum(
                fast_conv.phase_conv_s1(p, ks).astype(jnp.float32) ** 2) * 1e-6))

        res = {}
        for rep in ("", "2"):
            for name, fn, args in (
                ("stage_f", f, (kt, ks, x)),
                ("stage_g", g, (kt, ks, x)),
                ("pconv_f", pc, (ks, ph0)),
                ("pconv_g", gpc, (ks, ph0)),
            ):
                t = bench(fn, args)
                res[name + rep] = t
                print(f"{tag} {name+rep:9s} {t*1e3:7.2f} ms", flush=True)
        for k in ("stage_f", "stage_g", "pconv_f", "pconv_g"):
            print(f"{tag} {k}: {min(res[k], res[k+'2'])*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
