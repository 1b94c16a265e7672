"""int8 MXU A/B for the order-0 label shear chain.

The label chain's banded one-hot matmuls run bf16 (exact for class ids
<= 255, one nonzero product per output row). TPU v5e's MXU doubles
throughput for int8 x int8 -> int32 dots (394 TOPS vs 197 TFLOPS bf16) —
and the order-0 algebra is exactly representable there too: W is 0/1,
labels are u8, each output row sums ONE product <= 255, no overflow.
If XLA lowers the int8 einsum onto the MXU at rate, the (now
subset-gated) label chain halves again.

A/B: the production 9-pass order-0 chain (rotate_zoom_shear) vs an int8
twin of the same pass schedule, interleaved, per-sample vmapped like the
augmentation. Numerics must match bit-for-bit (both are exact NN).

RESULT (TPU v5e, b96, r4): **NEGATIVE — 0.84x.** Bit-exact (maxdiff 0)
but slower: bf16 41.37 ms vs int8 49.24 ms. XLA does not lower the
banded int8 einsum at the MXU's 2x int8 rate — the int32 accumulator
path costs more in converts/relayouts than the halved multiply width
saves. The bf16 chain stays the production path.

Run: python exp/label_int8_ab.py [BATCH [ITERS]]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print("backend:", jax.default_backend(), flush=True)

    margin, out = (144, 144, 144), (96, 96, 96)
    rng = np.random.default_rng(0)
    lbl = jax.device_put(
        rng.integers(0, 8, (batch, 1) + margin).astype(np.uint8)
    )
    angle_max, zoom_min = 0.4, 0.8

    def params(key):
        k1, k2 = jax.random.split(key)
        angles = jax.random.uniform(k1, (3,), minval=-angle_max,
                                    maxval=angle_max)
        zoom = jax.random.uniform(k2, (), minval=zoom_min, maxval=1.3)
        return angles, zoom

    @jax.jit
    def chain_bf16(x, key):
        keys = jax.random.split(key, x.shape[0])

        def one(v, k):
            a, z = params(k)
            return sr.rotate_zoom_shear(
                v, a, z, order=0, out_shape=out,
                angle_max=angle_max, zoom_min=zoom_min,
            )

        return jax.vmap(one)(x, keys)

    # --- int8 twin: monkeypatch the banded matmul for order 0 ---
    orig = sr._banded_matmul

    def banded_int8(w, x, spec, order, bf16):
        if order != 0:
            return orig(w, x, spec, order, bf16)
        return jnp.einsum(
            spec, w.astype(jnp.int8), x.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def chain_int8(x, key):
        keys = jax.random.split(key, x.shape[0])

        def one(v, k):
            a, z = params(k)
            sr._banded_matmul = banded_int8
            try:
                # int chain: skip the bf16 carry (ints stay ints end to end)
                return sr.rotate_zoom_shear(
                    v.astype(jnp.int8), a, z, order=0, out_shape=out,
                    angle_max=angle_max, zoom_min=zoom_min,
                ).astype(jnp.uint8)
            finally:
                sr._banded_matmul = orig

        return jax.vmap(one)(x, keys)

    key = jax.random.key(0)
    a = np.asarray(chain_bf16(lbl, key))
    b = np.asarray(chain_int8(lbl, key))
    print("exact match:", bool(np.array_equal(a, b)),
          "(maxdiff", int(np.abs(a.astype(int) - b.astype(int)).max()), ")",
          flush=True)

    results = {}
    for name, fn in (("bf16", chain_bf16), ("int8", chain_int8)):
        fn(lbl, key)
        best = float("inf")
        for _ in range(3):
            k = key
            t0 = time.perf_counter()
            for _ in range(iters):
                k, sub = jax.random.split(k)
                y = fn(lbl, sub)
            float(jnp.sum(y[:1, :, :2, :2, :8].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best * 1e3
    r = results
    print(f"B={batch}: bf16 {r['bf16']:.2f} ms  int8 {r['int8']:.2f} ms  "
          f"bf16/int8 {r['bf16']/r['int8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
