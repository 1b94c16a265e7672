"""VMEM-resident fused shear GROUP kernel A/B (VERDICT r3 #1b).

The augmentation's rotation+zoom chain is 9 banded-matmul passes; XLA runs
each pass as a batched GEMM but materializes full-tensor relayout copies
between passes (~94 ms est of bf16[96,144^3] copies in the b96 HLO-cycles
breakdown). Key structure: the 3 passes of one rotation axis all operate
WITHIN the same 2D plane (the rotation plane), independently across the
remaining axis and the batch — so a Pallas kernel can keep a
(coef, contract, rows) tile fully VMEM-resident across all 3 passes and
pay HBM exactly once per group.

Kernel formulation (per row-tile of 128 lanes):
- layout (coef_axis, contract_axis, rows): per coef index b (leading dim,
  cheap dynamic slice), the pass is dot(W_b (out,in), x[b] (in, rows)) on
  the MXU; W_b is built IN-KERNEL from the scalar shear coefficient via
  iota compares (banded interp weights; zero W traffic from HBM);
- between passes the (leading, sublane) roles swap: one in-VMEM
  jnp.transpose((1,0,2)) — lanes (rows) never move;
- manual HBM<->VMEM DMA (refs in ANY space) so only TWO ping-pong VMEM
  buffers exist (2 x 5.3 MB at 144^2 x 128 bf16) — auto-pipelined blocks
  would double-buffer in/out and blow the ~16 MB VMEM budget.

A/B: this kernel vs the production XLA 3-pass segment (shear_pass x3,
bf16 carry) on the b96 image-chain shape, interleaved in one process.
Numerics are checked against the XLA path first (order-1 tolerance ~1e-2
bf16 GEMM noise; order-0 exact).

RESULT (TPU v5e, b96, r4): **NEGATIVE — 0.70x.** The kernel is BIT-EXACT
vs the XLA segment (max|diff| = 0.0, orders 0 and 1) but slower: XLA group
21.98 ms vs Pallas 31.31 ms (FSP_TRANSPOSE=jnp; needed
vmem_limit_bytes=100MB — the in-kernel (144,144,128) transpose's scoped
allocation is 49.5 MB). The per-coef banded dots (144 x (144,144)@(144,128)
per pass) are MXU-padding/issue-bound, which costs more than the inter-pass
relayout copies the residency saves — XLA's batched GEMM is already near
the practical floor. FSP_TRANSPOSE=slice (fusing the transpose into
mid-dim operand reads) is structurally impossible: Mosaic requires
dynamic sublane indices to be multiples of 8 ("cannot statically prove
that index in dimension 1 is a multiple of 8"). Production is FURTHER from
this kernel's best case: augment vmaps PER-SAMPLE angles, so row tiles
cannot share W. Fourth confirmation of "don't pallas what XLA runs dense".

Run: python exp/fused_shear_pallas.py [BATCH [ITERS]]
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

N = 144  # margin extent (96 patch + 2*24), all three axes
RT = 128  # rows per tile (lane dim)


def _build_w(o_iota, u_iota, b_f, s, n, order):
    """Banded interp weights W(o,u) for coef value b — the in-kernel twin
    of ops.shear_resample._interp_matrix on pos = o - s*(b - center)."""
    import jax.numpy as jnp

    c_b = (n - 1) / 2.0
    pos = o_iota[:, :1] - s * (b_f - c_b)  # (n, 1)
    if order == 0:
        idx = jnp.floor(pos + 0.5)
        valid = (idx >= 0) & (idx <= n - 1)
        idx = jnp.clip(idx, 0, n - 1)
        return jnp.where((u_iota == idx) & valid, 1.0, 0.0)
    lo = jnp.clip(jnp.floor(pos), 0, n - 2)
    frac = pos - lo
    valid = (pos >= 0) & (pos <= n - 1)
    w = jnp.where(u_iota == lo, 1.0 - frac, 0.0)
    w = w + jnp.where(u_iota == lo + 1, frac, 0.0)
    return jnp.where(valid, w, 0.0)


def make_group_kernel(order: int, n_rows: int, transpose_mode: str = "jnp"):
    """pallas_call for one 3-pass rotation group on (N, N, n_rows)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s1_ref, s2_ref, x_ref, out_ref, buf0, buf1, sem_in, sem_out):
        i = pl.program_id(0)
        pltpu.make_async_copy(
            x_ref.at[:, :, pl.ds(i * RT, RT)], buf0, sem_in
        ).start()
        s1 = s1_ref[0, 0]
        s2 = s2_ref[0, 0]
        # Mosaic: iota must be integer-typed; convert for the f32 math
        o_iota = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0).astype(
            jnp.float32)
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1).astype(
            jnp.float32)
        pltpu.make_async_copy(
            x_ref.at[:, :, pl.ds(i * RT, RT)], buf0, sem_in
        ).wait()

        def shear(src, dst, s, mid):
            """One banded pass. ``mid``: the coef axis is src's MIDDLE
            (sublane-group) dim — slicing it per-iteration fuses the
            inter-pass transpose into the operand read, so the roles of
            (leading, sublane) swap for free and lanes (rows) never move."""

            def body(b, _):
                w = _build_w(o_iota, u_iota, b.astype(jnp.float32), s, N, order)
                if mid:
                    tile = src[:, pl.ds(b, 1), :].reshape(N, RT)
                else:
                    tile = src[pl.ds(b, 1)].reshape(N, RT)
                y = jax.lax.dot_general(
                    w.astype(jnp.bfloat16), tile,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dst[pl.ds(b, 1)] = y.astype(jnp.bfloat16)[None]
                return 0

            jax.lax.fori_loop(0, N, body, 0)

        if transpose_mode == "jnp":  # explicit transposes between passes
            shear(buf0, buf1, s1, mid=False)
            buf0[:] = jnp.transpose(buf1[:], (1, 0, 2))
            shear(buf0, buf1, s2, mid=False)
            buf0[:] = jnp.transpose(buf1[:], (1, 0, 2))
            shear(buf0, buf1, s1, mid=False)
        else:  # "slice": transposes fused into mid-dim operand reads
            shear(buf0, buf1, s1, mid=False)  # (d2,d1,rt) -> (d2,d1',rt)
            shear(buf1, buf0, s2, mid=True)   # -> (d1',d2',rt)
            shear(buf0, buf1, s1, mid=True)   # -> (d2',d1'',rt)
        cp = pltpu.make_async_copy(
            buf1, out_ref.at[:, :, pl.ds(i * RT, RT)], sem_out
        )
        cp.start()
        cp.wait()

    return pl.pallas_call(
        kernel,
        grid=(n_rows // RT,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N, n_rows), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((N, N, RT), jnp.bfloat16),
            pltpu.VMEM((N, N, RT), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=os.environ.get("FSP_INTERPRET", "") == "1",
    )


def main():
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.ops.shear_resample import shear_pass

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    order = int(os.environ.get("FSP_ORDER", "1"))
    tmode = os.environ.get("FSP_TRANSPOSE", "jnp")
    print("backend:", jax.default_backend(), "order:", order,
          "transpose:", tmode, flush=True)

    n_rows = batch * N
    if n_rows % RT:
        raise SystemExit(f"batch*{N} must divide {RT} (got {n_rows} rows); "
                         f"use batch 8/16/32/96/128")
    rng = np.random.default_rng(0)
    x_h = rng.standard_normal((batch, N, N, N)).astype(np.float32)
    if order == 0:
        x_h = rng.integers(0, 8, (batch, N, N, N)).astype(np.float32)
    x = jax.device_put(x_h.astype(jnp.bfloat16))
    s1_v, s2_v = -np.tan(0.3 / 2), np.sin(0.3)
    s1 = jnp.full((1, 1), s1_v, jnp.float32)
    s2 = jnp.full((1, 1), s2_v, jnp.float32)

    # --- XLA production segment: group 1 = sh(1,2,s1) sh(2,1,s2) sh(1,2,s1)
    @jax.jit
    def xla_group(v):
        v = shear_pass(v, 1, 2, jnp.float32(s1_v), order, bf16=True)
        v = shear_pass(v, 2, 1, jnp.float32(s2_v), order, bf16=True)
        v = shear_pass(v, 1, 2, jnp.float32(s1_v), order, bf16=True)
        return v

    # --- Pallas fused group (includes its XLA layout change, end to end)
    group = make_group_kernel(order, n_rows, tmode)

    @jax.jit
    def pallas_group(v):
        vp = jnp.transpose(v, (3, 2, 0, 1)).reshape(N, N, n_rows)
        out = group(s1, s2, vp)
        return jnp.transpose(
            out.reshape(N, N, batch, N), (2, 3, 1, 0)
        )

    # numerics first
    ref = np.asarray(xla_group(x), np.float32)
    got = np.asarray(pallas_group(x), np.float32)
    err = np.abs(ref - got).max()
    scale = max(np.abs(ref).max(), 1e-6)
    print(f"max|diff| = {err:.5f} (rel {err / scale:.2e})", flush=True)
    tol = 0.0 if order == 0 else 0.05
    if err > tol:
        bad = np.argwhere(np.abs(ref - got) > max(tol, 1e-6))
        print(f"MISMATCH at {bad[:5].tolist()} "
              f"ref={ref[tuple(bad[0])]:.4f} got={got[tuple(bad[0])]:.4f}")

    # interleaved timing, chained calls (the output feeds the next call)
    results = {}
    for name, fn in (("xla", xla_group), ("pallas", pallas_group)):
        fn(x)  # warm
        best = float("inf")
        for _ in range(3):
            y = x
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn(y)
            float(jnp.sum(y[:1, :1, :1, :8].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best * 1e3
    r = results
    print(f"B={batch} order={order}: xla {r['xla']:.2f} ms  "
          f"pallas {r['pallas']:.2f} ms  xla/pallas {r['xla']/r['pallas']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
