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
    axes = tuple(range(1, x.ndim))
    # real-input FFT at ~55% of the c2c FLOPs, no fftshift of the volume.
    # The legacy box mask M is centered at (s-1)/2, which is ASYMMETRIC
    # about DC on even axes; taking real(ifftn(M*K)) implicitly
    # symmetrizes the spectrum, so the exact r2c equivalent applies the
    # hermitian-symmetrized mask (M(f) + M(-f)) / 2 (values 0/0.5/1) —
    # bit-matching the legacy shifted-c2c formulation (test-pinned).
    k = jnp.fft.rfftn(x.astype(jnp.float32), axes=axes)
    dist = jnp.zeros(k.shape[1:], jnp.float32)
    dist_m = jnp.zeros(k.shape[1:], jnp.float32)
    for a, s in enumerate(x.shape[1:]):
        c = (s - 1) / 2.0
        coord = jnp.abs(jnp.arange(s, dtype=jnp.float32) - c) / jnp.maximum(c, 1.0)
        coord = jnp.fft.ifftshift(coord)  # unshifted-frequency order
        # the same coordinates evaluated at -f (frequency mirror)
        coord_m = jnp.concatenate([coord[:1], coord[:0:-1]])
        if a == nd - 1:
            coord = coord[: s // 2 + 1]  # rfft half-spectrum
            coord_m = coord_m[: s // 2 + 1]
        shape_a = (1,) * a + (coord.shape[0],) + (1,) * (nd - a - 1)
        dist = jnp.maximum(dist, coord.reshape(shape_a))
        dist_m = jnp.maximum(dist_m, coord_m.reshape(shape_a))
    radius = jnp.maximum(1.0 - alpha, 1e-3)
    mask = 0.5 * (
        (dist <= radius).astype(jnp.float32)
        + (dist_m <= radius).astype(jnp.float32)
    )
    out = jnp.fft.irfftn(k * mask[None].astype(k.dtype), s=x.shape[1:], axes=axes)
    return out.astype(x.dtype)


def kspace_spike(
    x: jax.Array, loc_frac: jax.Array, intensity_factor: jax.Array
) -> jax.Array:
    """Herringbone artifact: boost the log-magnitude of one k-space sample.

    ``loc_frac`` in [0,1)^nd picks the spike location (away from DC);
    ``intensity_factor`` scales the k-space maximum log-magnitude (MONAI
    KSpaceSpikeNoise parametrizes via log-intensity too).
    """
    axes = tuple(range(1, x.ndim))
    # no fftshift of the volume: the spike index maps into unshifted
    # frequency order instead (|k| max and the ifft are shift-invariant)
    k = jnp.fft.fftn(x, axes=axes)
    log_max = jnp.log(jnp.max(jnp.abs(k)) + 1e-12)
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
        for a in range(x.ndim - 1)
    )
    k = k.at[(slice(None),) + idx].set(spike_val.astype(k.dtype))
    out = jnp.fft.ifftn(k, axes=axes)
    return jnp.real(out).astype(x.dtype)


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
