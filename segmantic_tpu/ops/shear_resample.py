"""Shear-decomposed rotation + zoom (TPU-fast augmentation geometry).

A trilinear affine gather reads 8 scattered voxels per output voxel —
per-element gathers are the slowest memory pattern on TPU (~650 ms for an
8x144³ batch). This module implements the same content rotation + zoom as a
sequence of SHEAR and SCALE passes (Paeth decomposition:
``R(θ) = Shear_a(-tan θ/2) · Shear_b(sin θ) · Shear_a(-tan θ/2)``). Each
pass only shifts 1D lines by per-line fractional offsets, so the gathers
fetch whole contiguous rows (vectorized lane loads) instead of scalars —
~10x faster, identical zero-padding semantics, and for ``order=0`` each
line shift is integral (labels move as exact row permutations, no mixing).

Used by the fused on-device augmentation
(:mod:`segmantic_tpu.train.augment`) in place of the general affine gather;
the general gather (:mod:`segmantic_tpu.ops.resample`) remains the exact
reference for arbitrary matrices (spacing resample, inversion).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _center(n: int) -> float:
    return (n - 1) / 2.0


def _interp_matrix(pos: jax.Array, n_in: int, order: int) -> jax.Array:
    """Banded interpolation matrix W with W[..., o, u] the weight of input
    sample u for output position o (rows of out-of-range positions are 0).

    Turning the 1D resample into a matmul keeps the augmentation on the MXU
    instead of the gather unit — gathers are the slowest memory pattern on
    TPU, and a (144,144) banded matmul per line is ~an order of magnitude
    faster than the row-gather formulation at these sizes.
    """
    if order == 0:
        idx = jnp.round(pos).astype(jnp.int32)
        valid = (idx >= 0) & (idx <= n_in - 1)
        w = jax.nn.one_hot(jnp.clip(idx, 0, n_in - 1), n_in, dtype=jnp.float32)
        return w * valid[..., None]
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = (pos - lo.astype(jnp.float32))[..., None]
    valid = ((pos >= 0) & (pos <= n_in - 1))[..., None]
    w = jax.nn.one_hot(lo, n_in, dtype=jnp.float32) * (1.0 - frac)
    w = w + jax.nn.one_hot(lo + 1, n_in, dtype=jnp.float32) * frac
    return w * valid


def _restore_dtype(out: jax.Array, dtype) -> jax.Array:
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.rint(out).astype(dtype)
    return out.astype(dtype)


def shear_pass(
    x: jax.Array, a_axis: int, b_axis: int, s: jax.Array, order: int
) -> jax.Array:
    """Content shear: output line at (a, b) reads input a-coordinate
    ``a - s * (b - center_b)`` (about the volume center, zeros outside).

    ``x`` is channel-first (C, *spatial); ``a_axis``/``b_axis`` are spatial
    axis indices; ``s`` may be traced.
    """
    nd = x.ndim - 1
    a1, b1 = a_axis + 1, b_axis + 1
    rest = [d for d in range(1, x.ndim) if d not in (a1, b1)]
    perm = [0, a1, b1] + rest
    xt = jnp.transpose(x, perm)  # (C, NA, NB, *rest)
    c, na, nb = xt.shape[0], xt.shape[1], xt.shape[2]
    rest_shape = xt.shape[3:]

    b_rel = jnp.arange(nb, dtype=jnp.float32) - _center(nb)
    pos = (
        jnp.arange(na, dtype=jnp.float32)[:, None] - s.astype(jnp.float32) * b_rel[None, :]
    )  # (NA, NB): input a-coordinate per output line

    # per-b banded matmul on the MXU: out[c,o,b,r] = sum_u W[b,o,u] x[c,u,b,r]
    w = _interp_matrix(pos.T, na, order)  # (NB, NA_out, NA_in)
    xf = xt.reshape(c, na, nb, -1).astype(jnp.float32)
    out = jnp.einsum(
        "bou,cubr->cobr", w, xf, precision=jax.lax.Precision.HIGHEST
    )

    out = out.reshape((c, na, nb) + rest_shape)
    inv = [0] * x.ndim
    for i, p in enumerate(perm):
        inv[p] = i
    return _restore_dtype(jnp.transpose(out, inv), x.dtype)


def scale_pass(x: jax.Array, axis: int, zoom: jax.Array, order: int) -> jax.Array:
    """Per-axis content zoom about the center: input coord =
    (out - c) / zoom + c. Indices vary along one axis only (vector take)."""
    a1 = axis + 1
    n = x.shape[a1]
    xt = jnp.moveaxis(x, a1, 1)  # (C, N, *rest)
    c = xt.shape[0]
    flat = xt.reshape(c, n, -1)

    pos = (jnp.arange(n, dtype=jnp.float32) - _center(n)) / zoom.astype(
        jnp.float32
    ) + _center(n)
    # single banded matmul: out[c,o,r] = sum_u W[o,u] x[c,u,r]
    w = _interp_matrix(pos, n, order)  # (N_out, N_in)
    out = jnp.einsum(
        "ou,cur->cor", w, flat.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )

    out = out.reshape(xt.shape)
    return _restore_dtype(jnp.moveaxis(out, 1, a1), x.dtype)


def rotate_pass(
    x: jax.Array, axis: int, angle: jax.Array, order: int
) -> jax.Array:
    """Content rotation about one axis via three shears (Paeth).

    The rotation plane axes (a, b) are the two spatial axes != ``axis`` for
    3D, or (0, 1) for 2D; matches the plane conventions of
    ``segmantic_tpu.train.augment._rotation_matrix``.
    """
    nd = x.ndim - 1
    if nd == 2:
        a, b = 0, 1
    else:
        a, b = [d for d in range(3) if d != axis]
    sh1 = -jnp.tan(angle / 2.0)
    sh2 = jnp.sin(angle)
    # R(θ) content rotation = shear_a(sh1) ∘ shear_b(sh2) ∘ shear_a(sh1)
    x = shear_pass(x, a, b, sh1, order)
    x = shear_pass(x, b, a, sh2, order)
    x = shear_pass(x, a, b, sh1, order)
    return x


def rotate_zoom_shear(
    x: jax.Array,
    angles: jax.Array,  # (3,) or (1,) content rotation angles per axis
    zoom: jax.Array,  # scalar isotropic content zoom
    order: int,
) -> jax.Array:
    """Apply content rotations (axis order 0,1,2 — matching the composed
    matrix in the fused augmentation) then isotropic zoom, all about the
    volume center, same output shape, zeros outside."""
    nd = x.ndim - 1
    n_rot = angles.shape[0]
    for axis in range(n_rot):
        x = rotate_pass(x, axis, angles[axis], order)
    for axis in range(nd):
        x = scale_pass(x, axis, zoom, order)
    return x


def center_crop(x: jax.Array, out_shape: Sequence[int]) -> jax.Array:
    """Static center crop of a channel-first volume."""
    nd = x.ndim - 1
    sl = (slice(None),) + tuple(
        slice((x.shape[1 + a] - out_shape[a]) // 2,
              (x.shape[1 + a] - out_shape[a]) // 2 + out_shape[a])
        for a in range(nd)
    )
    return x[sl]
