"""A/B: production shear chain vs a CARRY-LAYOUT chain that permutes the
tensor's logical dim order between passes so each pass's contraction axis
is already minor — goal: kill the ~6 full-margin relayout copies XLA
inserts to feed the banded dots (exp/aug_hlo.py).

Same math, same weights; only dim bookkeeping differs.
Run: python exp/shear_carry_ab.py [B]
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

    def chain_carry(x, angles, zm, order, out_shape, angle_max, zoom_min,
                    bf16):
        nd = x.ndim - 1
        passes, divz = sr._folded_pass_list(nd, angles.shape[0])
        extents = sr._extent_schedule(x.shape[1:], out_shape, passes,
                                      angle_max, zoom_min, divz)
        shears = []
        for axis in range(angles.shape[0]):
            sh1 = -jnp.tan(angles[axis] / 2.0)
            sh2 = jnp.sin(angles[axis])
            shears.append((sh1, sh2, sh1))
        full = x.shape[1:]

        perm = list(range(x.ndim))  # perm[i] = ORIGINAL axis of carry dim i
        y = x
        letters = "cdefgh"
        for i, ((kind, a, b, (rax, slot)), ext) in enumerate(
            zip(passes, extents)
        ):
            a1, b1 = a + 1, b + 1
            pa, pb = perm.index(a1), perm.index(b1)
            na = y.shape[pa]
            nb = y.shape[pb]
            m = na if ext is None else min(ext, na)

            s = shears[rax][slot]
            if i in divz:
                s = s / zm.astype(jnp.float32)
            b_rel = jnp.arange(nb, dtype=jnp.float32) - sr._center(nb)
            o_glob = jnp.arange(m, dtype=jnp.float32) + float((na - m) // 2)
            if kind == "shz":
                frame = full[a]
                off_in = float((frame - na) // 2)
                c_f = sr._center(frame)
                pos = (
                    ((o_glob + off_in)[:, None] - c_f)
                    / zm.astype(jnp.float32)
                    + c_f
                    - s.astype(jnp.float32) * b_rel[None, :]
                ) - off_in
            else:
                pos = o_glob[:, None] - s.astype(jnp.float32) * b_rel[None, :]
            w = sr._interp_matrix(pos.T, na, order)  # (NB, M, NA)

            in_sub = [letters[j] for j in range(y.ndim)]
            in_sub[pa] = "u"
            in_sub[pb] = "b"
            out_sub = [c if c != "u" else "o" for c in in_sub]
            out_perm = perm
            if i + 1 < len(passes):
                next_a = passes[i + 1][1] + 1
                pn = perm.index(next_a)
                # move next pass's contraction dim to the minor slot
                out_sub = out_sub[:pn] + out_sub[pn + 1:] + [out_sub[pn]]
                out_perm = perm[:pn] + perm[pn + 1:] + [perm[pn]]
            else:
                # last pass: emit the ORIGINAL logical order directly
                cur_letter = {orig: out_sub[k] for k, orig in enumerate(perm)}
                out_sub = [cur_letter[j] for j in range(x.ndim)]
                out_perm = list(range(x.ndim))
            spec = f"bou,{''.join(in_sub)}->{''.join(out_sub)}"
            y = sr._banded_matmul(w, y, spec, order, bf16)
            y = sr._restore_dtype(y, x.dtype)
            perm = out_perm
        return y

    kw = dict(order=1, out_shape=(S,) * 3, angle_max=0.3, zoom_min=0.8,
              bf16=True)
    cur = jax.jit(jax.vmap(
        lambda im: sr.rotate_zoom_shear(im, angles, zoom, **kw)))
    car = jax.jit(jax.vmap(
        lambda im: chain_carry(im, angles, zoom, **kw)))

    a = cur(img)
    b = car(img)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max abs diff: {err:.3e} (expected 0: same contractions)")

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

    best = {"current": float("inf"), "carry": float("inf")}
    for _ in range(3):
        best["current"] = min(best["current"], bench(cur))
        best["carry"] = min(best["carry"], bench(car))
    for k, v in best.items():
        print(f"{k:>8s}: {v*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
