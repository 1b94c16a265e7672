"""Pallas TPU kernel: fused sliding-window Gaussian-blend accumulation.

The scatter half of sliding-window inference — ``acc[window] += logits *
importance`` over overlapping windows — is HBM-bandwidth-bound
read-modify-write. This kernel keeps the accumulator in HBM and streams
window tiles through VMEM with explicit async DMA: per (window, tile) grid
step it copies the acc tile in, fuses the multiply-add on the VPU, and
copies it back. TPU Pallas grids execute sequentially per core, so
overlapping windows are race-free by construction. The accumulator is
input/output-aliased (in-place, no HBM copy).

Layout/alignment contract (Mosaic requires provable alignment for dynamic
DMA offsets on the sublane/lane axes):
- channels are interleaved into the last axis: ``(D,H,W,C) -> (D,H,W*C)``,
  every ref <= 4D, DMA slices 3D;
- ``C`` must divide LANE_ALIGN (pad classes up to a power of two);
- window starts must satisfy ``s1 % SUBLANE_ALIGN == 0`` and
  ``(s2*C) % LANE_ALIGN == 0``; roi must satisfy ``r1 % SUBLANE_ALIGN == 0``
  and ``(r2*C) % LANE_ALIGN == 0``.
The sliding-window wrapper quantizes its window grid to this contract on
TPU and falls back to the XLA path otherwise (the weight-map accumulation
always stays on the XLA path — it is 1/C of the traffic).

Replaces MONAI's sliding-window blending
(reference: src/segmantic/seg/monai_unet.py:352-356,637-639).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE_ALIGN = 8  # required start alignment on the second-to-last axis
LANE_ALIGN = 128  # required start alignment on the last axis


def _blend_kernel(
    starts_ref,  # SMEM (B, 3) scalar-prefetch window origins
    logits_ref,  # VMEM (1, TILE, R1, R2*C) current logits tile
    impc_ref,  # VMEM (TILE, R1, R2*C) channel-repeated importance tile
    acc_hbm,  # ANY (D, H, W*C) accumulator input (aliased)
    acc_out,  # ANY alias of acc_hbm
    acc_scratch,  # VMEM (TILE, R1, R2*C)
    sem,  # DMA semaphore
    *,
    tile: int,
    channels: int,
):
    window = pl.program_id(0)
    tile_idx = pl.program_id(1)

    s0 = starts_ref[window, 0] + tile_idx * tile
    s1 = pl.multiple_of(starts_ref[window, 1], SUBLANE_ALIGN)
    s2c = pl.multiple_of(starts_ref[window, 2] * channels, LANE_ALIGN)

    r1 = impc_ref.shape[1]
    r2c = impc_ref.shape[2]

    acc_slice = acc_out.at[pl.ds(s0, tile), pl.ds(s1, r1), pl.ds(s2c, r2c)]

    load = pltpu.make_async_copy(acc_slice, acc_scratch, sem)
    load.start()
    load.wait()

    acc_scratch[...] = acc_scratch[...] + logits_ref[0] * impc_ref[...]

    store = pltpu.make_async_copy(acc_scratch, acc_slice, sem)
    store.start()
    store.wait()


@partial(jax.jit, static_argnames=("tile", "interpret"))
def accumulate_windows_pallas(
    acc: jax.Array,  # (D, H, W, C) f32
    logits: jax.Array,  # (B, R0, R1, R2, C) f32
    importance: jax.Array,  # (R0, R1, R2) f32
    starts: jax.Array,  # (B, 3) int32 window origins (aligned per contract)
    tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """acc[win] += logits * importance, in place. See module contract."""
    b, r0, r1, r2, c = logits.shape
    d, h, w, _ = acc.shape
    if r0 % tile != 0:
        raise ValueError(f"roi0 {r0} must be divisible by tile {tile}")
    n_tiles = r0 // tile

    acc_flat = acc.reshape(d, h, w * c)
    logits_flat = logits.astype(jnp.float32).reshape(b, r0, r1, r2 * c)
    imp = importance.astype(jnp.float32)
    impc = jnp.repeat(imp[..., None], c, axis=-1).reshape(r0, r1, r2 * c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, r1, r2 * c), lambda i, j, starts: (i, j, 0, 0)),
            pl.BlockSpec((tile, r1, r2 * c), lambda i, j, starts: (j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tile, r1, r2 * c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    acc2 = pl.pallas_call(
        partial(_blend_kernel, tile=tile, channels=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc_flat.shape, acc_flat.dtype),
        input_output_aliases={3: 0},  # acc in-place (index incl. prefetch arg)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, logits_flat, impc, acc_flat)

    return acc2.reshape(d, h, w, c)


def padded_channels(c: int) -> int:
    """Smallest power-of-two >= c that divides LANE_ALIGN."""
    p = 1
    while p < c:
        p *= 2
    return min(p, LANE_ALIGN)


def alignment_quanta(c_padded: int) -> Tuple[int, int]:
    """(axis-1 quantum, axis-2 quantum) for window starts/sizes."""
    return SUBLANE_ALIGN, max(LANE_ALIGN // c_padded, 1)


def supports_roi(roi: Tuple[int, int, int], c_padded: int) -> bool:
    q1, q2 = alignment_quanta(c_padded)
    return roi[1] % q1 == 0 and (roi[2] * c_padded) % LANE_ALIGN == 0


def pick_tile(r0: int, r1: int, r2: int, c: int, budget_bytes: int = 6 * 2**20) -> int:
    """Largest divisor of r0 whose (tile, r1, r2*c) f32 scratch fits budget."""
    best = 1
    for t in range(1, r0 + 1):
        if r0 % t == 0 and t * r1 * r2 * max(c, 1) * 4 <= budget_bytes:
            best = t
    return best
