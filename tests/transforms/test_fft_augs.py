"""rfft/shift-free Gibbs and k-space-spike == the shifted c2c formulation.

The ops were rewritten to avoid full-volume fftshifts (and r2c for Gibbs,
whose cutoff mask is hermitian-symmetric); these tests pin them against
the direct shifted-complex-FFT oracle.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from segmantic_tpu.transforms import intensity_ops as iops


def _gibbs_oracle(x, alpha):
    nd = x.ndim - 1
    axes = tuple(range(1, x.ndim))
    k = np.fft.fftshift(np.fft.fftn(np.asarray(x, np.float64), axes=axes),
                        axes=axes)
    dist = np.zeros(x.shape[1:], np.float64)
    for a, s in enumerate(x.shape[1:]):
        c = (s - 1) / 2.0
        coord = np.abs(np.arange(s) - c) / max(c, 1.0)
        dist = np.maximum(
            dist, coord.reshape((1,) * a + (s,) + (1,) * (nd - a - 1))
        )
    mask = (dist <= max(1.0 - alpha, 1e-3)).astype(k.dtype)
    out = np.fft.ifftn(np.fft.ifftshift(k * mask[None], axes=axes), axes=axes)
    return np.real(out)


def _spike_oracle(x, loc_frac, intensity):
    axes = tuple(range(1, x.ndim))
    k = np.fft.fftshift(np.fft.fftn(np.asarray(x, np.float64), axes=axes),
                        axes=axes)
    log_max = np.log(np.max(np.abs(k)) + 1e-12)
    idx = tuple(
        int(np.clip(int(loc_frac[a] * x.shape[1 + a]), 0, x.shape[1 + a] - 1))
        for a in range(x.ndim - 1)
    )
    k[(slice(None),) + idx] = np.exp(log_max * intensity)
    return np.real(np.fft.ifftn(np.fft.ifftshift(k, axes=axes), axes=axes))


def test_gibbs_matches_shifted_oracle():
    rng = np.random.default_rng(0)
    for shape in ((1, 12, 16, 8), (2, 15, 10)):  # even AND odd extents
        x = rng.standard_normal(shape).astype(np.float32)
        for alpha in (0.0, 0.35, 0.8):
            got = np.asarray(iops.gibbs_noise(jnp.asarray(x), jnp.float32(alpha)))
            ref = _gibbs_oracle(x, alpha)
            np.testing.assert_allclose(got, ref, atol=1e-4)


def test_spike_matches_shifted_oracle():
    rng = np.random.default_rng(1)
    for shape in ((1, 12, 16, 8), (2, 15, 10)):
        x = rng.standard_normal(shape).astype(np.float32)
        loc = np.asarray([0.7, 0.6, 0.8][: len(shape) - 1], np.float32)
        got = np.asarray(
            iops.kspace_spike(jnp.asarray(x), jnp.asarray(loc), jnp.float32(1.02))
        )
        ref = _spike_oracle(x, loc, 1.02)
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
