"""Pure jittable intensity-augmentation math (single sample, channel-first).

Shared by two callers:
- the dict-transforms in :mod:`segmantic_tpu.transforms.intensity` (host
  path, random params drawn with numpy RNG, math executed eagerly);
- the fused on-device batched augmentation in
  :mod:`segmantic_tpu.train.augment` (params drawn with ``jax.random``
  inside jit, ``vmap`` over the patch batch) — the TPU-native replacement
  for MONAI's per-volume host intensity transforms
  (reference: src/segmantic/seg/monai_unet.py:205-212).

All functions take explicit parameters (no RNG inside) so both paths share
exactly the same math. FFT-based ops (Gibbs / k-space spike) are natural in
XLA and fuse well.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def adjust_contrast(x: jax.Array, gamma: jax.Array) -> jax.Array:
    """Gamma contrast: normalize to [0,1] over the whole sample, apply
    ``**gamma``, map back (MONAI AdjustContrast semantics)."""
    mn = jnp.min(x)
    rng = jnp.max(x) - mn
    eps = 1e-7
    xn = (x - mn) / jnp.maximum(rng, eps)
    return jnp.power(jnp.maximum(xn, eps), gamma) * jnp.maximum(rng, eps) + mn


def histogram_shift(x: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
    """Piecewise-linear intensity remap through shifted control points.

    ``src``/``dst`` are (num_control_points,) monotone sequences in the
    sample's [min, max] range (MONAI RandHistogramShift semantics).

    Formulated gather-free as a sum of clamped linear segments —
    f(v) = dst[0] + sum_i m_i * clip(v - src_i, 0, src_{i+1} - src_i) —
    which runs as pure VPU FMAs instead of searchsorted+gather (matters on
    TPU where this maps over whole patch batches).
    """
    mn, mx = jnp.min(x), jnp.max(x)
    deltas = jnp.maximum(src[1:] - src[:-1], 1e-12)
    slopes = (dst[1:] - dst[:-1]) / deltas
    out = jnp.full_like(x, dst[0])
    for i in range(src.shape[0] - 1):
        out = out + slopes[i] * jnp.clip(x - src[i], 0.0, deltas[i])
    # preserve original global range like MONAI (control points pin ends)
    return jnp.clip(out, mn, mx)


def polynomial_bias_field(
    shape: Tuple[int, ...], coeff: jax.Array, degree: int = 3
) -> jax.Array:
    """exp(polynomial) multiplicative bias field over normalized coords [-1,1].

    ``coeff`` has one entry per monomial with total degree <= ``degree``
    (MONAI RandBiasField model).
    """
    nd = len(shape)
    coords = [
        jnp.linspace(-1.0, 1.0, s).reshape((1,) * a + (s,) + (1,) * (nd - a - 1))
        for a, s in enumerate(shape)
    ]
    terms = []
    if nd == 3:
        for i in range(degree + 1):
            for j in range(degree + 1 - i):
                for k in range(degree + 1 - i - j):
                    terms.append(coords[0] ** i * coords[1] ** j * coords[2] ** k)
    else:
        for i in range(degree + 1):
            for j in range(degree + 1 - i):
                terms.append(coords[0] ** i * coords[1] ** j)
    basis = jnp.stack([jnp.broadcast_to(t, shape) for t in terms])
    field = jnp.tensordot(coeff, basis, axes=1)
    return jnp.exp(field)


def num_bias_coeff(nd: int, degree: int = 3) -> int:
    if nd == 3:
        return sum(
            1
            for i in range(degree + 1)
            for j in range(degree + 1 - i)
            for _ in range(degree + 1 - i - j)
        )
    return sum(1 for i in range(degree + 1) for _ in range(degree + 1 - i))


def bias_field(x: jax.Array, coeff: jax.Array, degree: int = 3) -> jax.Array:
    field = polynomial_bias_field(x.shape[1:], coeff, degree)
    return x * field[None].astype(x.dtype)


def gibbs_noise(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Gibbs ringing: hard low-pass in k-space, keeping a centered ball of
    radius ``1 - alpha`` (normalized); ``alpha=0`` is identity.

    The reference's MONAI transform exposes the same ``alpha in [0,1]``
    knob; we use a hard radial cutoff, the textbook Gibbs model.
    """
    nd = x.ndim - 1
    # The chebyshev-ball cutoff mask is a PER-AXIS PRODUCT of 1-D boxes, so
    # the k-space projection factorizes: Re(F^-1 (prod_a m_a) F x)
    # = Re(tensor_a A_a) x with A_a = F_a^-1 diag(m_a) F_a — a per-axis
    # complex circulant applied as small (s x s) MXU matmuls instead of a
    # 3-D FFT round trip (the FFT pair was most of the remaining batch-96
    # augmentation cost; exp/intensity_split.py). Complex bookkeeping:
    # track (real, imag) of the partially-applied operator; A_a has a
    # nonzero imaginary part on even axes (the box about (s-1)/2 is
    # asymmetric in unshifted frequencies). Matches the legacy shifted-c2c
    # formulation to f32 rounding (test-pinned, even AND odd extents).
    radius = jnp.maximum(1.0 - alpha, 1e-3)
    hi = jax.lax.Precision.HIGHEST
    y_r = x.astype(jnp.float32)
    y_i = None
    letters = "bcdefg"[: x.ndim]
    for a, s in enumerate(x.shape[1:]):
        c = (s - 1) / 2.0
        coord = jnp.abs(jnp.arange(s, dtype=jnp.float32) - c) / max(c, 1.0)
        coord = jnp.fft.ifftshift(coord)  # unshifted-frequency order
        m = (coord <= radius).astype(jnp.float32)  # (s,)
        fi = jnp.arange(s, dtype=jnp.int32)
        # reduce f*r mod s in exact integer arithmetic BEFORE the f32
        # cos/sin — unreduced angles up to 2π s lose ~1e-4 of precision
        ang = (2.0 * np.pi / s) * (
            (fi[:, None] * fi[None, :]) % s
        ).astype(jnp.float32)  # (r, f)
        cm = jnp.cos(ang)
        sm = jnp.sin(ang)
        # A = (1/s) (cm + i sm) @ diag(m) @ (cm - i sm)^T
        r_mat = (cm * m) @ cm.T + (sm * m) @ sm.T
        i_mat = (sm * m) @ cm.T - (cm * m) @ sm.T
        r_mat = r_mat / s
        i_mat = i_mat / s
        in_sub = list(letters)
        in_sub[a + 1] = "u"
        out_sub = list(letters)
        out_sub[a + 1] = "o"
        spec = f"ou,{''.join(in_sub)}->{''.join(out_sub)}"

        def app(mat, t):
            return jnp.einsum(spec, mat, t, precision=hi)

        last = a == nd - 1
        if y_i is None:
            new_r = app(r_mat, y_r)
            new_i = None if last else app(i_mat, y_r)
        else:
            new_r = app(r_mat, y_r) - app(i_mat, y_i)
            new_i = None if last else app(i_mat, y_r) + app(r_mat, y_i)
        y_r, y_i = new_r, new_i
    return y_r.astype(x.dtype)


def kspace_spike(
    x: jax.Array, loc_frac: jax.Array, intensity_factor: jax.Array
) -> jax.Array:
    """Herringbone artifact: boost the log-magnitude of one k-space sample.

    ``loc_frac`` in [0,1)^nd picks the spike location (away from DC);
    ``intensity_factor`` scales the k-space maximum log-magnitude (MONAI
    KSpaceSpikeNoise parametrizes via log-intensity too).
    """
    nd = x.ndim - 1
    axes = tuple(range(1, x.ndim))
    xf = x.astype(jnp.float32)
    # By linearity, setting one k-sample to v and inverting equals adding
    # (v - K[idx]) times that sample's complex exponential in image space:
    #   real(ifftn(K + (v - K[idx]) δ_idx)) = x + real((v - K[idx]) e_idx)/ΠN
    # so the inverse FFT disappears entirely and the forward spectrum is
    # only needed for MONAI's log-max normalization — computable from the
    # half-spectrum rfftn (hermitian symmetry preserves the max). One rfftn
    # + two fused elementwise sweeps instead of fftn + ifftn (the spike was
    # ~60% of the batch-96 augmentation's FFT cost; exp/intensity_split.py).
    k_half = jnp.fft.rfftn(xf, axes=axes)
    log_max = jnp.log(jnp.max(jnp.abs(k_half)) + 1e-12)
    spike_val = jnp.exp(log_max * intensity_factor)

    idx = tuple(
        (
            jnp.clip(
                (loc_frac[a] * x.shape[1 + a]).astype(jnp.int32),
                0,
                x.shape[1 + a] - 1,
            )
            - x.shape[1 + a] // 2
        )
        % x.shape[1 + a]
        for a in range(nd)
    )
    # phase(r) = 2π Σ_a idx_a r_a / N_a (unshifted-frequency exponential)
    phase = jnp.zeros((1,) * x.ndim, jnp.float32)
    for a in range(nd):
        n = x.shape[1 + a]
        # reduce idx*r mod n in int32 BEFORE the f32 multiply (angles stay in
        # [0, 2π) instead of growing to ~2π·n and shedding mantissa bits) —
        # same exact-angle construction as the gibbs_noise circulants above
        v = (2.0 * np.pi / n) * (
            (idx[a] * jnp.arange(n, dtype=jnp.int32)) % n
        ).astype(jnp.float32)
        phase = phase + v.reshape((1,) * (a + 1) + (n,) + (1,) * (nd - a - 1))
    cosp = jnp.cos(phase)
    sinp = jnp.sin(phase)
    # the per-channel forward DFT sample K[idx] = Σ_r x e^{-i phase}
    k_re = jnp.sum(xf * cosp, axis=axes, keepdims=True)
    k_im = -jnp.sum(xf * sinp, axis=axes, keepdims=True)
    d_re = spike_val - k_re
    d_im = -k_im
    nprod = float(np.prod(x.shape[1:]))
    out = xf + (d_re * cosp - d_im * sinp) / nprod
    return out.astype(x.dtype)


def zscore(x: jax.Array, channel_wise: bool = True, nonzero: bool = False) -> jax.Array:
    axes = tuple(range(1, x.ndim)) if channel_wise else None
    if nonzero:
        mask = (x != 0).astype(x.dtype)
        count = jnp.maximum(jnp.sum(mask, axis=axes, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=axes, keepdims=True) / count
        var = jnp.sum(((x - mean) * mask) ** 2, axis=axes, keepdims=True) / count
        std = jnp.sqrt(var)
        return jnp.where(mask > 0, (x - mean) / jnp.maximum(std, 1e-7), x)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    return (x - mean) / jnp.maximum(std, 1e-7)


def flip(x: jax.Array, do_flip: jax.Array) -> jax.Array:
    """Conditionally flip each spatial axis; ``do_flip`` is a (nd,) bool vector
    (traceable — used inside jit for per-patch random flips)."""
    for a in range(x.ndim - 1):
        flipped = jnp.flip(x, axis=a + 1)
        x = jnp.where(do_flip[a], flipped, x)
    return x


def random_control_points(
    key: jax.Array, num_control_points: int, mn: jax.Array, mx: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """MONAI-style histogram-shift control points: evenly spaced sources,
    destinations jittered within neighbor bounds, ends pinned."""
    src = jnp.linspace(0.0, 1.0, num_control_points)
    interval = 1.0 / (num_control_points - 1)
    noise = jax.random.uniform(
        key, (num_control_points,), minval=-0.45 * interval, maxval=0.45 * interval
    )
    noise = noise.at[0].set(0.0).at[-1].set(0.0)
    dst = jnp.sort(src + noise)
    scale = mx - mn
    return src * scale + mn, dst * scale + mn
