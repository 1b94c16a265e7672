"""A/B: the 12-pass shear/scale chain with explicit per-pass transposes
(current shear_pass) vs in-place einsums that address the shear axes where
they are (no transposes — XLA decides how to feed the MXU).

Exact same math; layouts only. Run: python exp/shear_layout_ab.py [B]
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

    from segmantic_tpu.ops import shear_resample as sr

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    S, M = 96, 144
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, 1, M, M, M)), jnp.bfloat16)
    angles = jnp.asarray([0.2, -0.15, 0.1], jnp.float32)
    zoom = jnp.asarray(1.08, jnp.float32)

    # ---- in-place pass: einsum addresses (a, b) axes directly
    def shear_pass_inplace(x, a_axis, b_axis, s, order, out_extent, bf16):
        a1, b1 = a_axis + 1, b_axis + 1
        na, nb = x.shape[a1], x.shape[b1]
        m = na if out_extent is None else min(out_extent, na)
        b_rel = jnp.arange(nb, dtype=jnp.float32) - sr._center(nb)
        o_glob = jnp.arange(m, dtype=jnp.float32) + float((na - m) // 2)
        pos = o_glob[:, None] - s.astype(jnp.float32) * b_rel[None, :]
        w = sr._interp_matrix(pos.T, na, order)  # (NB, M, NA)
        letters = "cdef"[: x.ndim]
        in_sub = list(letters)
        in_sub[a1] = "u"
        in_sub[b1] = "b"
        out_sub = list(letters)
        out_sub[a1] = "o"
        out_sub[b1] = "b"
        spec = f"bou,{''.join(in_sub)}->{''.join(out_sub)}"
        out = sr._banded_matmul(w, x, spec, order, bf16)
        return sr._restore_dtype(out, x.dtype)

    def scale_pass_inplace(x, axis, zm, order, out_extent, bf16, frame_extent):
        a1 = axis + 1
        n = x.shape[a1]
        m = n if out_extent is None else min(out_extent, n)
        frame = n if frame_extent is None else frame_extent
        off_in = (frame - n) // 2
        o_full = jnp.arange(m, dtype=jnp.float32) + float((n - m) // 2 + off_in)
        pos_full = (o_full - sr._center(frame)) / zm.astype(jnp.float32) \
            + sr._center(frame)
        pos = pos_full - float(off_in)
        w = sr._interp_matrix(pos, n, order)  # (M, N)
        letters = "cdef"[: x.ndim]
        in_sub = list(letters)
        in_sub[a1] = "u"
        out_sub = list(letters)
        out_sub[a1] = "o"
        spec = f"ou,{''.join(in_sub)}->{''.join(out_sub)}"
        out = sr._banded_matmul(w, x, spec, order, bf16)
        return sr._restore_dtype(out, x.dtype)

    def chain_inplace(x, angles, zm, order, out_shape, angle_max, zoom_min,
                      bf16):
        nd = x.ndim - 1
        passes = sr._pass_list(nd, angles.shape[0])
        extents = sr._extent_schedule(x.shape[1:], out_shape, passes,
                                      angle_max, zoom_min)
        shears = []
        for axis in range(angles.shape[0]):
            sh1 = -jnp.tan(angles[axis] / 2.0)
            sh2 = jnp.sin(angles[axis])
            shears.append((sh1, sh2, sh1))
        full = x.shape[1:]
        for (kind, a, b, (rax, slot)), ext in zip(passes, extents):
            if kind == "sh":
                x = shear_pass_inplace(x, a, b, shears[rax][slot], order,
                                       ext, bf16)
            else:
                x = scale_pass_inplace(x, a, zm, order, ext, bf16, full[a])
        return x

    kw = dict(order=1, out_shape=(S,) * 3, angle_max=0.3, zoom_min=0.8,
              bf16=True)

    cur = jax.jit(jax.vmap(
        lambda im: sr.rotate_zoom_shear(im, angles, zoom, **kw)))
    inp = jax.jit(jax.vmap(
        lambda im: chain_inplace(im, angles, zoom, **kw)))

    a = cur(img)
    b = inp(img)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max abs diff: {err:.3e} (expected ~0: same math)")

    def bench(fn, n=6, rounds=3):
        out = fn(img)
        float(out.ravel()[0].astype(jnp.float32))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(img)
            float(out.ravel()[0].astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    best = {"current": float("inf"), "inplace": float("inf")}
    for _ in range(3):
        best["current"] = min(best["current"], bench(cur))
        best["inplace"] = min(best["inplace"], bench(inp))
    for k, v in best.items():
        print(f"{k:>8s}: {v*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
