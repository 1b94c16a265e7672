"""Pallas implicit-GEMM for the phase-space stride-1 3^nd conv (3D).

The subpixel phase decoder stages (models/unet.py, ops/fast_conv.py) run
their 3^3 SAME convs as an expanded kernel-3 conv over the phase-major
tensor — dense 64/128 lanes but 8x structurally-zero FLOPs, which XLA
cannot skip (fast_conv.expand_s1_kernel is 1/8 nonzero). Profiling the
b96 production step (exp/hlo_cycles.py) puts that conv family at ~20% of
estimated step cycles (fwd + dx + dw).

This kernel realizes the ROUND_NOTES "true-window implicit GEMM"
derivation: the union of the true 3^3 windows of all 8 output phases of
a block is the 4^3 full-res window [2d-1, 2d+2], which is exactly two
consecutive planes of the half-block-shifted re-phasing

    P'[e].group g  =  p[e - g].phase g        (full-res position 2e - g)

so the conv becomes EIGHT dense (rows, L) @ (L, L) accumulating matmuls
(L = 2^3 * C lanes; contraction 8L = the (rows, 512)@(512, 64) GEMM for
the d0 head) — a 27/8 = 3.375x FLOP cut with zero structural waste. The
P' planes are assembled IN VMEM with lane-group selects (each phase
group shifts by its own phase bits; no lane permutation — the weight
expansion absorbs the group order), so HBM traffic stays ~3x input
(D-halo views) + output, never the 27x im2col.

A pure-XLA version of the same factorization (fast_conv.phase_conv_s1_k2)
measured 0.7x — XLA materializes the re-phasing as three full-tensor
select passes and runs the kernel-2 conv at ~10% MFU — so the fusion has
to happen in one kernel (this file). exp/phase_k2_ab.py holds the A/Bs.

reference workload: the decoder stages of the MONAI UNet topology,
src/segmantic/seg/monai_unet.py:114-124.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


@lru_cache(maxsize=None)
def _sel_k2_groups() -> np.ndarray:
    """T[a, g, po, t]: tap t of the true kernel reached by P' group bit g
    at block offset a for output phase po (per axis): position
    2(d+a) - g = 2d + po + t - 1  =>  t = 2a - g - po + 1, 0 <= t < 3."""
    tsel = np.zeros((2, 2, 2, 3), np.float32)
    for a in range(2):
        for g in range(2):
            for po in range(2):
                t = 2 * a - g - po + 1
                if 0 <= t < 3:
                    tsel[a, g, po, t] = 1.0
    return tsel


def expand_kernel_k2_groups(w: jax.Array) -> jax.Array:
    """(3,3,3, Ci, Co) -> (2,2,2, 8*Ci, 8*Co) for the group-in-place P'
    convention (P' group g = phase g shifted by g; standard phase-major
    output). 27/64 nonzero — the FLOPs the GEMM actually runs."""
    nd = w.ndim - 2
    sel = jnp.asarray(_sel_k2_groups(), w.dtype)
    taps, blocks = "tuv"[:nd], "abc"[:nd]
    gin, pout = "PQR"[:nd], "XYZ"[:nd]
    ein = (
        f"{taps}io,"
        + ",".join(f"{b}{g}{o}{t}" for b, g, o, t in
                   zip(blocks, gin, pout, taps))
        + f"->{blocks}{gin}i{pout}o"
    )
    ci, co = w.shape[-2], w.shape[-1]
    wsub = jnp.einsum(ein, w, *([sel] * nd))
    return wsub.reshape((2,) * nd + (2**nd * ci, 2**nd * co))


def _fwd_kernel(v0, v1, v2, w2, out, pp, acc, *, H, W, L, C):
    """One (b, d) grid step: assemble the new P' plane (group-in-place)
    into the rotating ``pp`` scratch and run the 8 accumulating
    (H*W, L) @ (L, L) dots.

    v_dz: (1,1,H+2,W+2,L) views of the zero-padded input at plane d+dz
    (original planes d-1, d, d+1). pp: (2, H+1, W+1, L) scratch holding
    P'[e] in slot e % 2 — P'[d] survives from the previous step, only
    P'[d+1] is assembled (both at d == 0 / batch transitions).
    """
    d = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    group = lane // C  # phase-major: bit (2-k) of group = phase along axis k
    m1 = ((group >> 2) & 1) == 1
    m2 = ((group >> 1) & 1) == 1
    m3 = (group & 1) == 1

    def plane_term(v, g2, g3):
        return v[0, 0, 1 - g2:1 - g2 + H + 1, 1 - g3:1 - g3 + W + 1, :]

    def hw_select(v):
        # in-plane (H, W) part of P': group bits g2/g3 pick the shifted read
        t1 = jnp.where(m3, plane_term(v, 1, 1), plane_term(v, 1, 0))
        t0 = jnp.where(m3, plane_term(v, 0, 1), plane_term(v, 0, 0))
        return jnp.where(m2, t1, t0)

    @pl.when(d == 0)
    def _():
        # P'[0] from (pad, p[0]) = (v0, v1); slot 0
        pp[0] = jnp.where(m1, hw_select(v0), hw_select(v1))

    # P'[d+1] from (p[d], p[d+1]) = (v1, v2); slot (d+1) % 2
    pp[(d + 1) % 2] = jnp.where(m1, hw_select(v1), hw_select(v2))

    first = True
    for a1 in range(2):
        slot = (d + a1) % 2
        for a2 in range(2):
            for a3 in range(2):
                op = pp[slot, a2:a2 + H, a3:a3 + W, :].reshape(H * W, L)
                r = jnp.dot(op, w2[a1, a2, a3],
                            preferred_element_type=jnp.float32)
                if first:
                    acc[...] = r
                    first = False
                else:
                    acc[...] += r
    out[0, 0] = acc[...].reshape(H, W, L).astype(out.dtype)


@lru_cache(maxsize=None)
def _sel_fold_w() -> np.ndarray:
    """S[par_src, par_out, dr, g3, a3]: which W-axis tap a3 is reached from
    folded-lane parity ``par_src`` at folded row shift ``dr - 1`` for output
    parity ``par_out`` and lane phase bit g3. Derivation: output W-block
    2k + par_out reads P' block +a3, whose g3 lanes read input W-block
    2k + par_out + a3 - g3 = 2(k + dr - 1) + par_src."""
    s = np.zeros((2, 2, 3, 2, 2), np.float32)
    for ps in range(2):
        for po in range(2):
            for dr in range(3):
                for g3 in range(2):
                    a3 = g3 - po + ps + 2 * (dr - 1)
                    if 0 <= a3 < 2:
                        s[ps, po, dr, g3, a3] = 1.0
    return s


def fold_weights_w3(w2: jax.Array) -> jax.Array:
    """(2,2,2, L, L) k2 weights -> (2,2,2, 2L, 2L) folded-lane weights.

    The W-axis taps are absorbed into parity-mixing matrices: per (a1, a2)
    there are two column blocks — j=0 is the centered folded row (dr = 1,
    all parities), j=1 merges the dr=0 block (only par_src=1 rows are
    live: a3 = g3 - po + ps - 2 needs ps=1) with the dr=2 block (only
    par_src=0), which the kernel feeds with a parity-selected operand.
    Zero structural waste: K = 8 * 2L carries exactly the true-window
    GEMM's MACs (the 27/8 = 3.375x cut)."""
    L = w2.shape[-1]
    c = L // 8
    w2v = w2.reshape(2, 2, 2, 2, 2, 2, c, L)  # [a1,a2,a3, g1,g2,g3, c, out]
    s = jnp.asarray(_sel_fold_w(), w2.dtype)
    w3 = jnp.einsum("abtPQRco,spdRt->abdsPQRcpo", w2v, s)
    w3 = w3.reshape(2, 2, 3, 2, L, 2 * L)  # [...,dr, par_src, L-rows, out]
    center = w3[:, :, 1]
    merged = jnp.stack([w3[:, :, 2, 0], w3[:, :, 0, 1]], axis=2)
    return jnp.stack(
        [center, merged], axis=2
    ).reshape(2, 2, 2, 2 * L, 2 * L)


def _fwd_kernel_folded(vd, vd1, w3, out, hs, pp, patch, *, H, WF, L2):
    """Folded variant for L = 64 phase tensors: the W-block parity is packed
    into lanes ((…, W, 64) -> (…, W/2, 128) — a contiguous reshape), so
    every VPU op runs at full 128-lane width and the compute is ONE deep
    (H*WF, 12*L2) @ (12*L2, L2) GEMM per plane.

    No XLA-side padding: vd/vd1 are UNPADDED plane views (d and d+1,
    clamped); ``hs`` is a persistent 3-slot halo scratch whose borders are
    zeroed once and whose interiors rotate (slot = plane % 3) — only the
    new plane is copied per step, boundary planes are zero-filled.

    ``pp`` absorbs the D/H lane-group shifts
    (pp[e][i2, kf, (par, g, c)] = p[e-g1, i2-g2, folded (kf, par)]); the
    W-axis structure lives entirely in the :func:`fold_weights_w3`
    matrices (the dr-indexed row blocks of w3) — no lane-movement ops.
    """
    b = pl.program_id(0)
    d = pl.program_id(1)
    D = pl.num_programs(1)
    L = L2 // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L2), 2)
    group = (lane % L) // (L // 8)
    m1 = ((group >> 2) & 1) == 1  # g1: D-plane select
    m2 = ((group >> 1) & 1) == 1  # g2: H-shift select

    @pl.when((b == 0) & (d == 0))
    def _():
        hs[...] = jnp.zeros_like(hs)  # borders stay zero forever

    @pl.when(d == 0)
    def _():
        hs[2, 1:H + 1, 1:WF + 1, :] = jnp.zeros_like(vd[0, 0])  # plane -1
        hs[0, 1:H + 1, 1:WF + 1, :] = vd[0, 0]  # plane 0

    @pl.when(d + 1 <= D - 1)
    def _():
        hs[(d + 1) % 3, 1:H + 1, 1:WF + 1, :] = vd1[0, 0]

    @pl.when(d + 1 > D - 1)
    def _():
        hs[(d + 1) % 3, 1:H + 1, 1:WF + 1, :] = jnp.zeros_like(vd1[0, 0])

    def assemble(lo_slot, hi_slot):
        def term(s, g2):
            return hs[s, 1 - g2:2 - g2 + H, :, :]

        tlo = jnp.where(m2, term(lo_slot, 1), term(lo_slot, 0))
        thi = jnp.where(m2, term(hi_slot, 1), term(hi_slot, 0))
        return jnp.where(m1, tlo, thi)

    @pl.when(d == 0)
    def _():
        pp[0] = assemble(2, 0)  # P'[0] from planes -1, 0

    pp[(d + 1) % 2] = assemble(d % 3, (d + 1) % 3)  # P'[d+1]

    # (H*WF, 8*L2) patch: columns are full-lane-width blocks (aligned
    # stores); one deep GEMM carries exactly the true-window MACs. Per
    # (a1, a2): col j=0 is the centered folded row, col j=1 parity-selects
    # between the dr=0 (par1 lanes) and dr=2 (par0 lanes) rows.
    par = lane >= L
    col = 0
    for a1 in range(2):
        slot = (d + a1) % 2
        for a2 in range(2):
            colA = pp[slot, a2:a2 + H, 1:1 + WF, :].reshape(H * WF, L2)
            colB = jnp.where(
                par.reshape(1, L2),
                pp[slot, a2:a2 + H, 0:WF, :].reshape(H * WF, L2),
                pp[slot, a2:a2 + H, 2:2 + WF, :].reshape(H * WF, L2),
            )
            patch[:, col * L2:(col + 1) * L2] = colA
            patch[:, (col + 1) * L2:(col + 2) * L2] = colB
            col += 2
    r = jnp.dot(patch[...], w3[...], preferred_element_type=jnp.float32)
    out[0, 0] = r.reshape(H, WF, L2).astype(out.dtype)


def phase_conv_gemm_folded_p(pf: jax.Array, w3: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Folded phase conv: pf (B, D, H, WF, 2L) = contiguous reshape of the
    (B, D, H, 2*WF, L) phase tensor; w3 (2,2,3,2L,2L) from
    :func:`fold_weights_w3`."""
    B, D, H, WF, L2 = pf.shape

    def view_spec(dz):
        return pl.BlockSpec(
            (1, 1, H, WF, L2),
            lambda b, d, dz=dz: (b, jnp.minimum(d + dz, D - 1), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    wbig = w3.reshape(8 * L2, L2)
    return pl.pallas_call(
        partial(_fwd_kernel_folded, H=H, WF=WF, L2=L2),
        grid=(B, D),
        in_specs=[
            # vd is only READ at d == 0 (bootstrap of the halo scratch):
            # pinning its index to plane 0 makes Pallas fetch it once per
            # batch item instead of re-DMAing every step
            pl.BlockSpec((1, 1, H, WF, L2), lambda b, d: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            view_spec(1),
            pl.BlockSpec((8 * L2, L2), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, WF, L2), lambda b, d: (b, d, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, WF, L2), pf.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, H + 2, WF + 2, L2), pf.dtype),
            pltpu.VMEM((2, H + 1, WF + 2, L2), pf.dtype),
            pltpu.VMEM((H * WF, 8 * L2), pf.dtype),
        ],
        interpret=interpret,
    )(pf, pf, wbig)


def supported(p_shape: Tuple[int, ...], dtype=jnp.bfloat16) -> bool:
    """Static eligibility: 3D phase tensors with MXU-friendly lanes."""
    if len(p_shape) != 5:
        return False
    b, d, h, w, L = p_shape
    if L % 8 or L < 64 or L > 512:
        return False
    if w % 8 or w < 8:
        return False
    es = jnp.dtype(dtype).itemsize  # input/scratch element size (2 or 4)
    views = 3 * (h + 2) * (w + 2) * max(L, 128) * es * 2
    pp = 2 * (h + 1) * (w + 1) * max(L, 128) * es
    acc = h * w * max(L, 128) * 4
    outb = h * w * max(L, 128) * es * 2
    wmat = 8 * L * max(L, 128) * es
    patch = 8 * h * w * L * es if _fold_ok(p_shape) else 0
    return views + pp + acc + outb + wmat + patch < _VMEM_BUDGET


def phase_conv_gemm_p(p: jax.Array, w2: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Phase conv on a pre-expanded kernel: p (B,D,H,W,L) phase-major,
    w2 (2,2,2,L,L) from :func:`expand_kernel_k2_groups`."""
    B, D, H, W, L = p.shape
    C = L // 8
    ppad = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def view_spec(dz):
        return pl.BlockSpec(
            (1, 1, H + 2, W + 2, L),
            lambda b, d, dz=dz: (b, d + dz, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        partial(_fwd_kernel, H=H, W=W, L=L, C=C),
        grid=(B, D),
        in_specs=[
            view_spec(0),
            view_spec(1),
            view_spec(2),
            pl.BlockSpec((2, 2, 2, L, L), lambda b, d: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W, L), lambda b, d: (b, d, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, L), p.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, H + 1, W + 1, L), p.dtype),
            pltpu.VMEM((H * W, L), jnp.float32),
        ],
        interpret=interpret,
    )(ppad, ppad, ppad, w2)


def _dw_kernel_folded(vd, vd1, go, dw_out, hs, pp, patch, acc,
                      *, H, WF, L2):
    """dW3 for the folded phase conv: the SAME P'/patch assembly as
    :func:`_fwd_kernel_folded`, with the plane GEMM transposed —
    acc (8*L2, L2) f32 accumulates patch^T @ dout across the whole
    (B, D) grid and is written once at the last step. The result is the
    cotangent of ``fold_weights_w3(expand_kernel_k2_groups(w))``;
    :func:`_unfold_dw` carries it back to the true (3,3,3,Ci,Co) kernel."""
    b = pl.program_id(0)
    d = pl.program_id(1)
    B = pl.num_programs(0)
    D = pl.num_programs(1)
    L = L2 // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L2), 2)
    group = (lane % L) // (L // 8)
    m1 = ((group >> 2) & 1) == 1
    m2 = ((group >> 1) & 1) == 1

    @pl.when((b == 0) & (d == 0))
    def _():
        hs[...] = jnp.zeros_like(hs)
        acc[...] = jnp.zeros_like(acc)

    @pl.when(d == 0)
    def _():
        hs[2, 1:H + 1, 1:WF + 1, :] = jnp.zeros_like(vd[0, 0])
        hs[0, 1:H + 1, 1:WF + 1, :] = vd[0, 0]

    @pl.when(d + 1 <= D - 1)
    def _():
        hs[(d + 1) % 3, 1:H + 1, 1:WF + 1, :] = vd1[0, 0]

    @pl.when(d + 1 > D - 1)
    def _():
        hs[(d + 1) % 3, 1:H + 1, 1:WF + 1, :] = jnp.zeros_like(vd1[0, 0])

    def assemble(lo_slot, hi_slot):
        def term(s, g2):
            return hs[s, 1 - g2:2 - g2 + H, :, :]

        tlo = jnp.where(m2, term(lo_slot, 1), term(lo_slot, 0))
        thi = jnp.where(m2, term(hi_slot, 1), term(hi_slot, 0))
        return jnp.where(m1, tlo, thi)

    @pl.when(d == 0)
    def _():
        pp[0] = assemble(2, 0)

    pp[(d + 1) % 2] = assemble(d % 3, (d + 1) % 3)

    par = lane >= L
    col = 0
    for a1 in range(2):
        slot = (d + a1) % 2
        for a2 in range(2):
            colA = pp[slot, a2:a2 + H, 1:1 + WF, :].reshape(H * WF, L2)
            colB = jnp.where(
                par.reshape(1, L2),
                pp[slot, a2:a2 + H, 0:WF, :].reshape(H * WF, L2),
                pp[slot, a2:a2 + H, 2:2 + WF, :].reshape(H * WF, L2),
            )
            patch[:, col * L2:(col + 1) * L2] = colA
            patch[:, (col + 1) * L2:(col + 2) * L2] = colB
            col += 2
    g2d = go[0, 0].reshape(H * WF, L2)
    acc[...] += jax.lax.dot_general(
        patch[...], g2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((b == B - 1) & (d == D - 1))
    def _():
        dw_out[...] = acc[...]


def phase_conv_gemm_dw_folded_p(pf: jax.Array, gf: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """dW3 (8*L2, L2) f32 for the folded phase conv: pf/gf are the folded
    input / output-cotangent tensors (B, D, H, WF, L2)."""
    B, D, H, WF, L2 = pf.shape

    return pl.pallas_call(
        partial(_dw_kernel_folded, H=H, WF=WF, L2=L2),
        grid=(B, D),
        in_specs=[
            pl.BlockSpec((1, 1, H, WF, L2), lambda b, d: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, H, WF, L2),
                lambda b, d: (b, jnp.minimum(d + 1, D - 1), 0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, WF, L2), lambda b, d: (b, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * L2, L2), lambda b, d: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * L2, L2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, H + 2, WF + 2, L2), pf.dtype),
            pltpu.VMEM((2, H + 1, WF + 2, L2), pf.dtype),
            pltpu.VMEM((H * WF, 8 * L2), pf.dtype),
            pltpu.VMEM((8 * L2, L2), jnp.float32),
        ],
        interpret=interpret,
    )(pf, pf, gf)


def _dw_kernel(v0, v1, v2, go, dw_out, pp, acc, *, H, W, L, C):
    """dW2 (2,2,2,L,L) for the direct (unfolded) kernel: same P' assembly
    as :func:`_fwd_kernel`, accumulating pp_slice^T @ dout per tap."""
    b = pl.program_id(0)
    d = pl.program_id(1)
    B = pl.num_programs(0)
    D = pl.num_programs(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    group = lane // C
    m1 = ((group >> 2) & 1) == 1
    m2 = ((group >> 1) & 1) == 1
    m3 = (group & 1) == 1

    def plane_term(v, g2, g3):
        return v[0, 0, 1 - g2:1 - g2 + H + 1, 1 - g3:1 - g3 + W + 1, :]

    def hw_select(v):
        t1 = jnp.where(m3, plane_term(v, 1, 1), plane_term(v, 1, 0))
        t0 = jnp.where(m3, plane_term(v, 0, 1), plane_term(v, 0, 0))
        return jnp.where(m2, t1, t0)

    @pl.when((b == 0) & (d == 0))
    def _():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(d == 0)
    def _():
        pp[0] = jnp.where(m1, hw_select(v0), hw_select(v1))

    pp[(d + 1) % 2] = jnp.where(m1, hw_select(v1), hw_select(v2))

    g2d = go[0, 0].reshape(H * W, L)
    i = 0
    for a1 in range(2):
        slot = (d + a1) % 2
        for a2 in range(2):
            for a3 in range(2):
                op = pp[slot, a2:a2 + H, a3:a3 + W, :].reshape(H * W, L)
                acc[i] += jax.lax.dot_general(
                    op, g2d, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                i += 1

    @pl.when((b == B - 1) & (d == D - 1))
    def _():
        dw_out[...] = acc[...]


def phase_conv_gemm_dw_p(p: jax.Array, g: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """dW2 (8, L, L) f32 for the direct kernel (index 8 = (a1,a2,a3))."""
    B, D, H, W, L = p.shape
    C = L // 8
    ppad = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def view_spec(dz):
        return pl.BlockSpec(
            (1, 1, H + 2, W + 2, L),
            lambda b, d, dz=dz: (b, d + dz, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        partial(_dw_kernel, H=H, W=W, L=L, C=C),
        grid=(B, D),
        in_specs=[
            view_spec(0),
            view_spec(1),
            view_spec(2),
            pl.BlockSpec((1, 1, H, W, L), lambda b, d: (b, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, L, L), lambda b, d: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, H + 1, W + 1, L), p.dtype),
            pltpu.VMEM((8, L, L), jnp.float32),
        ],
        interpret=interpret,
    )(ppad, ppad, ppad, g)


def _unfold_dw(dw_flat: jax.Array, w: jax.Array, folded: bool) -> jax.Array:
    """Carry the kernel's dW2/dW3 cotangent back to the true (3,3,3,Ci,Co)
    kernel through the adjoint of the (linear) weight expansion."""
    zeros = jnp.zeros(w.shape, jnp.float32)
    if folded:
        L2 = dw_flat.shape[-1]
        cot = dw_flat.reshape(2, 2, 2, L2, L2).astype(jnp.float32)
        _, vjpf = jax.vjp(
            lambda wt: fold_weights_w3(expand_kernel_k2_groups(wt)), zeros)
    else:
        L = dw_flat.shape[-1]
        cot = dw_flat.reshape(2, 2, 2, L, L).astype(jnp.float32)
        _, vjpf = jax.vjp(lambda wt: expand_kernel_k2_groups(wt), zeros)
    (dw,) = vjpf(cot)
    return dw.astype(w.dtype)


def _flip_io(w: jax.Array) -> jax.Array:
    """dx kernel of a SAME stride-1 conv: spatial flip + in/out swap."""
    return jnp.flip(w, (0, 1, 2)).swapaxes(-1, -2)


def phase_conv_gemm_dw(p: jax.Array, g: jax.Array, w: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """True-kernel weight gradient dW (3,3,3,Ci,Co) via the implicit-GEMM
    dw kernels (folded for L=64, direct otherwise)."""
    if _fold_ok(p.shape):
        B, D, H, W, L = p.shape
        pf = p.reshape(B, D, H, W // 2, 2 * L)
        gf = g.reshape(B, D, H, W // 2, 2 * L)
        dflat = phase_conv_gemm_dw_folded_p(pf, gf, interpret=interpret)
        return _unfold_dw(dflat, w, folded=True)
    dflat = phase_conv_gemm_dw_p(p, g, interpret=interpret)
    return _unfold_dw(dflat, w, folded=False)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def phase_conv(p: jax.Array, w: jax.Array, interpret: bool = False):
    """Differentiable phase-space 3^3 SAME conv with implicit-GEMM Pallas
    backward: dx reuses the forward kernel with the flipped/io-swapped
    kernel (dx of a SAME stride-1 conv IS that conv), dw runs the
    transposed-GEMM kernels. Forward routes through the Pallas kernel too;
    callers that prefer the XLA forward at large batch wrap this with
    their own routing (see fast_conv.phase_conv_s1)."""
    return phase_conv_gemm(p, w, interpret=interpret)


def _phase_conv_fwd(p, w, interpret):
    return phase_conv_gemm(p, w, interpret=interpret), (p, w)


def _phase_conv_bwd(interpret, res, g):
    p, w = res
    dp = phase_conv_gemm(g, _flip_io(w), interpret=interpret)
    dw = phase_conv_gemm_dw(p, g, w, interpret=interpret)
    return dp, dw


phase_conv.defvjp(_phase_conv_fwd, _phase_conv_bwd)


def _fold_ok(p_shape) -> bool:
    b, d, h, w, L = p_shape
    return L == 64 and w % 16 == 0


@partial(jax.jit, static_argnames=("interpret",))
def phase_conv_gemm(p: jax.Array, w: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Drop-in for fast_conv.phase_conv_s1 (3D): p (B,D,H,W,8*C) phase-major,
    w (3,3,3,C,C') true kernel. Forward only — see phase_conv for the
    differentiable wrapper. L=64 tensors route through the W-parity-folded
    kernel (full-width lanes); L>=128 through the direct one."""
    w2 = expand_kernel_k2_groups(w).astype(p.dtype)
    if _fold_ok(p.shape):
        B, D, H, W, L = p.shape
        pf = p.reshape(B, D, H, W // 2, 2 * L)
        out = phase_conv_gemm_folded_p(pf, fold_weights_w3(w2),
                                       interpret=interpret)
        return out.reshape(B, D, H, W, L)
    return phase_conv_gemm_p(p, w2, interpret=interpret)
