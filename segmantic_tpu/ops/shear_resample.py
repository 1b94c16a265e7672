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

Two further TPU optimizations (measured v5e, 8x144³→96³ batch):

- the banded interpolation matmuls can run in bf16 with f32 accumulation
  (a single MXU pass instead of f32-precision emulation, ``bf16=True``).
  This is EXACT for the order-0 label path — one-hot weights and integer
  class ids <= 255 are bf16-representable and each output row has a single
  nonzero product — so order 0 always uses it; the order-1 image path
  opts in when the surrounding pipeline computes in bf16 anyway (mixed-
  precision training), else stays full-f32 with an exact identity;
- the trailing isotropic zoom FOLDS into the last shear per axis (exact
  affine conjugation — :func:`_folded_pass_list`), so the whole 3D
  rotation+zoom is NINE banded passes, not 9 shears + 3 scales;
- passes shrink their output to the center window later passes actually
  need (``out_shape`` + static reach bounds from the angle/zoom ranges),
  instead of carrying the full margin through every pass and cropping
  at the end. Center-aligned same-parity windows keep every pass's
  coordinate math exact, so the shrunk pipeline matches
  full-frame-then-crop to float precision (bit-identical on the label
  path, ~1-ulp GEMM-regrouping noise on the image path; test-pinned).

Used by the fused on-device augmentation
(:mod:`segmantic_tpu.train.augment`) in place of the general affine gather;
the general gather (:mod:`segmantic_tpu.ops.resample`) remains the exact
reference for arbitrary matrices (spacing resample, inversion).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _center(n: int) -> float:
    return (n - 1) / 2.0


def rotation_matrix(nd: int, angles: jax.Array) -> jax.Array:
    """Compose per-axis content rotations (axis order 0,1,2) into one
    nd x nd matrix — the matrix the shear chain factorizes."""
    if nd == 2:
        c, s = jnp.cos(angles[0]), jnp.sin(angles[0])
        return jnp.array([[c, -s], [s, c]])
    rot = jnp.eye(3)
    for axis in range(3):
        a, b = [d for d in range(3) if d != axis]
        c, s = jnp.cos(angles[axis]), jnp.sin(angles[axis])
        m = jnp.eye(3)
        m = m.at[a, a].set(c).at[a, b].set(-s).at[b, a].set(s).at[b, b].set(c)
        rot = m @ rot
    return rot


def rotate_zoom_nn_gather(
    x: jax.Array,
    angles: jax.Array,
    zoom: jax.Array,
    out_shape: Sequence[int],
) -> jax.Array:
    """Direct composed-affine nearest-neighbor resample: the label twin of
    ``rotate_zoom_shear(order=0)`` + center crop, as ONE flat gather.

    The 9-pass NN chain rounds to the grid after every pass; composing the
    same rotation+zoom into a single affine (``in = R.T @ (out - c)/z + c``
    about the full-frame center) and rounding ONCE is the ideal-resample
    semantics MONAI's ``Rand{Rotate,Zoom}d(mode="nearest")`` applies to
    label maps (reference: src/segmantic/seg/monai_unet.py:187-205). The
    gather stays in the label's native integer dtype (1 byte/voxel on the
    u8 wire vs the chain's bf16 matmuls) and uses the chain's
    translation-invariant ``floor(pos + 0.5)`` rounding.
    """
    nd = x.ndim - 1
    in_shape = x.shape[1:]
    rot = rotation_matrix(nd, angles)
    inv = rot.T / zoom.astype(jnp.float32)  # in = rot.T @ (out - c)/z + c

    # output window center-aligned in the full frame (same net offset as
    # the extent-scheduled chain + center_crop: (n - m) // 2 per axis)
    grids = [
        jax.lax.broadcasted_iota(jnp.float32, tuple(out_shape), dimension=a)
        + float((in_shape[a] - out_shape[a]) // 2)
        - _center(in_shape[a])
        for a in range(nd)
    ]
    strides = [1] * nd
    for a in range(nd - 2, -1, -1):
        strides[a] = strides[a + 1] * in_shape[a + 1]

    inside = jnp.ones(tuple(out_shape), dtype=bool)
    lin = jnp.zeros(tuple(out_shape), jnp.int32)
    for a in range(nd):
        pos = sum(inv[a, b] * grids[b] for b in range(nd)) + _center(in_shape[a])
        i = jnp.floor(pos + 0.5).astype(jnp.int32)
        inside &= (i >= 0) & (i <= in_shape[a] - 1)
        lin = lin + jnp.clip(i, 0, in_shape[a] - 1) * strides[a]

    flat = x.reshape(x.shape[0], -1)  # native dtype: u8 labels gather as u8
    out = jnp.take(flat, lin.reshape(-1), axis=1).reshape(
        (x.shape[0],) + tuple(out_shape)
    )
    return jnp.where(inside[None], out, jnp.zeros((), x.dtype))


def _interp_matrix(pos: jax.Array, n_in: int, order: int) -> jax.Array:
    """Banded interpolation matrix W with W[..., o, u] the weight of input
    sample u for output position o (rows of out-of-range positions are 0).

    Turning the 1D resample into a matmul keeps the augmentation on the MXU
    instead of the gather unit — gathers are the slowest memory pattern on
    TPU, and a (144,144) banded matmul per line is ~an order of magnitude
    faster than the row-gather formulation at these sizes.
    """
    if order == 0:
        # floor(pos + 0.5), not round(): round-half-to-even flips exact
        # .5 ties under integer window offsets (ITK's Math::Round is also
        # floor-based), so NN picks must be translation-invariant
        idx = jnp.floor(pos + 0.5).astype(jnp.int32)
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


def _banded_matmul(w: jax.Array, x: jax.Array, spec: str, order: int,
                   bf16: bool) -> jax.Array:
    """The banded-interp einsum on the MXU.

    order 0 always runs bf16 (one-hot weights and integer class ids <= 255
    are bf16-exact, one nonzero product per output row); order 1 runs bf16
    with f32 accumulation when ``bf16`` (single MXU pass, ~0.4% weight
    noise — used when the training pipeline computes in bf16 anyway), else
    full-f32 HIGHEST precision (exact identity)."""
    if bf16 or order == 0:
        return jnp.einsum(
            spec, w.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        spec, w, x.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    )


def shear_pass(
    x: jax.Array, a_axis: int, b_axis: int, s: jax.Array, order: int,
    out_extent: Optional[int] = None, bf16: bool = False,
    zoom: Optional[jax.Array] = None, frame_extent: Optional[int] = None,
) -> jax.Array:
    """Content shear: output line at (a, b) reads input a-coordinate
    ``a - s * (b - center_b)`` (about the volume center, zeros outside).

    ``x`` is channel-first (C, *spatial); ``a_axis``/``b_axis`` are spatial
    axis indices; ``s`` may be traced. ``out_extent`` (same parity as the
    input extent) emits only the center window along ``a_axis``.

    With ``zoom`` the pass is the MERGED shear+scale banded map
    ``a_in = (a_out - c)/zoom + c - s*(b - c_b)`` about the FULL-frame
    center (``frame_extent`` — required, like :func:`scale_pass`): the
    chain's trailing isotropic zoom folds into the last shear per axis
    (exact affine algebra; see :func:`rotate_zoom_shear`). The position
    arithmetic computes the full-frame value first and subtracts the
    integer window offset last, so shrunk windows stay bit-identical to
    the full frame.
    """
    a1, b1 = a_axis + 1, b_axis + 1
    na, nb = x.shape[a1], x.shape[b1]
    m = na if out_extent is None else min(out_extent, na)

    b_rel = jnp.arange(nb, dtype=jnp.float32) - _center(nb)
    # global output index = local index + exact integer window offset, so a
    # shrunk pass computes bit-identical positions to the full frame
    o_glob = jnp.arange(m, dtype=jnp.float32) + float((na - m) // 2)
    if zoom is None:
        pos = (
            o_glob[:, None] - s.astype(jnp.float32) * b_rel[None, :]
        )  # (M, NB): input a-coordinate per output line
    else:
        frame = na if frame_extent is None else frame_extent
        off_in = float((frame - na) // 2)
        c_f = _center(frame)
        o_full = o_glob + off_in
        pos_full = (
            (o_full[:, None] - c_f) / zoom.astype(jnp.float32)
            + c_f
            - s.astype(jnp.float32) * b_rel[None, :]
        )
        pos = pos_full - off_in  # exact: integer offset off a same-grid f32

    # per-b banded matmul on the MXU, contracting the a-axis IN PLACE —
    # the einsum addresses (a, b) wherever they sit, so no transposes
    # bracket the pass (bit-identical, ~8% faster: exp/shear_layout_ab.py)
    w = _interp_matrix(pos.T, na, order)  # (NB, M, NA_in)
    letters = "cdefgh"[: x.ndim]
    in_sub = list(letters)
    in_sub[a1] = "u"
    in_sub[b1] = "b"
    out_sub = list(letters)
    out_sub[a1] = "o"
    out_sub[b1] = "b"
    spec = f"bou,{''.join(in_sub)}->{''.join(out_sub)}"
    out = _banded_matmul(w, x, spec, order, bf16)
    return _restore_dtype(out, x.dtype)


def scale_pass(
    x: jax.Array, axis: int, zoom: jax.Array, order: int,
    out_extent: Optional[int] = None, bf16: bool = False,
    frame_extent: Optional[int] = None,
) -> jax.Array:
    """Per-axis content zoom about the center: input coord =
    (out - c) / zoom + c. Indices vary along one axis only (vector take).

    ``frame_extent`` is the ORIGINAL full extent of this axis when ``x`` is
    a center-aligned window of it: positions are computed in the full frame
    (bit-identical to the unshrunk computation) and shifted by the exact
    integer window offset — integer subtraction on f32 here is exact, so
    nearest-neighbor rounding cannot flip relative to the full frame."""
    a1 = axis + 1
    n = x.shape[a1]
    m = n if out_extent is None else min(out_extent, n)
    frame = n if frame_extent is None else frame_extent
    off_in = (frame - n) // 2  # window offset of x inside the full frame

    o_full = jnp.arange(m, dtype=jnp.float32) + float((n - m) // 2 + off_in)
    pos_full = (o_full - _center(frame)) / zoom.astype(jnp.float32) + _center(frame)
    pos = pos_full - float(off_in)
    # single banded matmul contracting the axis in place (no moveaxis)
    w = _interp_matrix(pos, n, order)  # (M, N_in)
    letters = "cdefgh"[: x.ndim]
    in_sub = list(letters)
    in_sub[a1] = "u"
    out_sub = list(letters)
    out_sub[a1] = "o"
    spec = f"ou,{''.join(in_sub)}->{''.join(out_sub)}"
    out = _banded_matmul(w, x, spec, order, bf16)
    return _restore_dtype(out, x.dtype)


def _pass_list(nd: int, n_rot: int) -> List[Tuple[str, int, int, Tuple[int, int]]]:
    """Ordered (kind, a_axis, b_axis, (rot_axis, slot)) for the full chain.

    kind 'sh': shear of a by b; slot 0/2 are the tan-half shears, slot 1 the
    sin shear. kind 'sc': per-axis zoom (b_axis unused).
    """
    passes: List[Tuple[str, int, int, Tuple[int, int]]] = []
    for axis in range(n_rot):
        if nd == 2:
            a, b = 0, 1
        else:
            a, b = [d for d in range(3) if d != axis]
        passes.append(("sh", a, b, (axis, 0)))
        passes.append(("sh", b, a, (axis, 1)))
        passes.append(("sh", a, b, (axis, 2)))
    for axis in range(nd):
        passes.append(("sc", axis, -1, (-1, -1)))
    return passes


def _folded_pass_list(nd: int, n_rot: int):
    """The shear chain with the trailing isotropic zoom FOLDED into the
    last shear per a-axis (kind 'shz'), dropping the ``nd`` standalone
    scale passes. Moving the scale D_a earlier past a shear conjugates it:
    exec(sh, D_a) == exec(D_a, sh') with s' = s/z when the shear's b-axis
    is a (coordinates it reads are now pre-scaled), unchanged otherwise —
    so every pass after axis a's fold point with b == a divides its
    coefficient by the zoom. Exact affine algebra (oracle-pinned:
    test_rotation_zoom_matches_affine_gather).

    Returns (passes, divz): 4-tuples like :func:`_pass_list` (kinds
    'sh'/'shz') and the set of pass indices whose s divides by zoom.
    """
    passes = [p for p in _pass_list(nd, n_rot) if p[0] == "sh"]
    divz: set = set()
    for axis in range(nd):
        occ = [i for i, p in enumerate(passes) if p[1] == axis]
        if not occ:  # an axis never sheared still needs its scale pass
            passes.append(("sc", axis, -1, (-1, -1)))
            continue
        i = occ[-1]
        passes[i] = ("shz",) + passes[i][1:]
        for j in range(i + 1, len(passes)):
            if passes[j][2] == axis:
                divz.add(j)
    return passes, divz


def _extent_schedule(
    full: Sequence[int],
    out_shape: Sequence[int],
    passes: List[Tuple[str, int, int, Tuple[int, int]]],
    angle_max: float,
    zoom_min: float,
    divz: Optional[set] = None,
) -> List[int]:
    """Static per-pass output extents, walked backward from ``out_shape``.

    A shear of a by b with |s| <= s_max needs input support
    need_a + 2*ceil(s_max * need_b / 2) + 2 (interp stencil + rounding);
    a zoom >= zoom_min needs need / zoom_min + 2. Extents keep the full
    frame's parity (center-aligned crops then preserve the exact center)
    and are capped at the full margin.
    """
    t_max = abs(math.tan(angle_max / 2.0))
    s_max = abs(math.sin(angle_max))
    zlo = min(zoom_min, 1.0)
    divz = divz or set()

    def with_parity(v: float, axis: int) -> int:
        n = int(math.ceil(v))
        if (n - full[axis]) % 2:
            n += 1
        return min(n, full[axis])

    # parity-match the final extents to the full frame so every crop is
    # exactly center-aligned; the caller's center_crop trims the remainder
    # with the same floor semantics as the legacy full-frame path
    need = [with_parity(o, ax) for ax, o in enumerate(out_shape)]

    out_extents = [0] * len(passes)
    for i in range(len(passes) - 1, -1, -1):
        kind, a, b, (_, slot) = passes[i]
        out_extents[i] = need[a]
        if kind == "sc":
            need[a] = with_parity(need[a] / zlo + 2, a)
        else:
            smax = s_max if slot == 1 else t_max
            if i in divz:  # coefficient divided by the (folded) zoom
                smax = smax / zlo
            reach = need[a] / zlo if kind == "shz" else need[a]
            need[a] = with_parity(reach + 2 * (smax * need[b] / 2.0 + 1), a)
    return out_extents


def rotate_zoom_shear(
    x: jax.Array,
    angles: jax.Array,  # (3,) or (1,) content rotation angles per axis
    zoom: jax.Array,  # scalar isotropic content zoom
    order: int,
    out_shape: Optional[Sequence[int]] = None,
    angle_max: float = 0.0,
    zoom_min: float = 1.0,
    bf16: bool = False,
) -> jax.Array:
    """Apply content rotations (axis order 0,1,2 — matching the composed
    matrix in the fused augmentation) then isotropic zoom, all about the
    volume center, same output shape, zeros outside.

    With ``out_shape`` (+ static ``angle_max``/``zoom_min`` bounds on the
    traced parameters), every pass emits only the center window later
    passes need, and the result is the center ``out_shape`` crop of the
    full-frame computation — bit-identical, at a fraction of the work.
    """
    nd = x.ndim - 1
    n_rot = angles.shape[0]
    # 12 -> 9 banded passes: the trailing isotropic zoom folds into the
    # last shear per a-axis (merged affine pass; later passes reading the
    # folded axis as b divide their coefficient by the zoom — exact
    # conjugation, oracle-pinned by the combined rotation+zoom test)
    passes, divz = _folded_pass_list(nd, n_rot)
    if out_shape is not None:
        extents = _extent_schedule(
            x.shape[1:], out_shape, passes, angle_max, zoom_min, divz
        )
    else:
        extents = [None] * len(passes)

    # u8 NN chains (label maps): run every pass in bf16 and restore the
    # integer dtype ONCE at the end. One-hot rows copy exact values, f32
    # accumulation of a single product is exact, and class ids <= 255 are
    # bf16-exact — so the 12 per-pass rint+convert round trips are pure
    # wasted sweeps (~36 ms of the 62 ms batch-32 augmentation was the
    # label half; exp/step_ablate.py). Bit-identical output.
    restore_dtype = None
    if order == 0 and x.dtype == jnp.uint8:
        restore_dtype = x.dtype
        x = x.astype(jnp.bfloat16)

    shears = []
    for axis in range(n_rot):
        sh1 = -jnp.tan(angles[axis] / 2.0)
        sh2 = jnp.sin(angles[axis])
        shears.append((sh1, sh2, sh1))
    full = x.shape[1:]
    for i, ((kind, a, b, (rot_axis, slot)), ext) in enumerate(
        zip(passes, extents)
    ):
        if kind == "sc":
            x = scale_pass(x, a, zoom, order, ext, bf16, frame_extent=full[a])
            continue
        s = shears[rot_axis][slot]
        if i in divz:
            s = s / zoom.astype(jnp.float32)
        x = shear_pass(
            x, a, b, s, order, ext, bf16,
            zoom=zoom if kind == "shz" else None,
            frame_extent=full[a] if kind == "shz" else None,
        )
    if restore_dtype is not None:
        x = _restore_dtype(x, restore_dtype)
    return x


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


def center_crop(x: jax.Array, out_shape: Sequence[int]) -> jax.Array:
    """Static center crop of a channel-first volume."""
    nd = x.ndim - 1
    sl = (slice(None),) + tuple(
        slice((x.shape[1 + a] - out_shape[a]) // 2,
              (x.shape[1 + a] - out_shape[a]) // 2 + out_shape[a])
        for a in range(nd)
    )
    return x[sl]
