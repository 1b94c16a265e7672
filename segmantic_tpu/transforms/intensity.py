"""Intensity dict-transforms (host path) + Nyul histogram standardization.

Wraps the shared jnp math in :mod:`.intensity_ops` with numpy-RNG parameter
draws — equivalents of the reference's intensity augmentation zoo
(reference: src/segmantic/seg/monai_unet.py:205-212) and NyulNormalize
(reference: src/segmantic/seg/nyul_normalize.py:10-78).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..core.volume import Volume
from .base import MapTransform, RandMapTransform, Sample
from . import intensity_ops as ops


def _apply(vol: Volume, fn, *args) -> Volume:
    data = np.asarray(fn(vol.numpy().astype(np.float32), *args))
    return vol.with_data(data)


class RandAdjustContrastd(RandMapTransform):
    def __init__(self, keys, prob: float = 0.1, gamma=(0.5, 4.5)):
        super().__init__(keys, prob)
        self.gamma = gamma if isinstance(gamma, (tuple, list)) else (0.5, gamma)

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if not self.should_apply(rng):
            return sample
        g = np.float32(rng.uniform(*self.gamma))
        out = dict(sample)
        for key in self.present_keys(sample):
            out[key] = _apply(sample[key], ops.adjust_contrast, g)
        return out


class RandHistogramShiftd(RandMapTransform):
    def __init__(self, keys, prob: float = 0.1, num_control_points: int = 10):
        super().__init__(keys, prob)
        self.num_control_points = num_control_points

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if not self.should_apply(rng):
            return sample
        out = dict(sample)
        n = self.num_control_points
        for key in self.present_keys(sample):
            vol: Volume = sample[key]
            data = vol.numpy().astype(np.float32)
            mn, mx = float(data.min()), float(data.max())
            src = np.linspace(0.0, 1.0, n)
            interval = 1.0 / (n - 1)
            noise = rng.uniform(-0.45 * interval, 0.45 * interval, n)
            noise[0] = noise[-1] = 0.0
            dst = np.sort(src + noise)
            scale = mx - mn
            out[key] = _apply(
                vol,
                ops.histogram_shift,
                (src * scale + mn).astype(np.float32),
                (dst * scale + mn).astype(np.float32),
            )
        return out


class RandBiasFieldd(RandMapTransform):
    def __init__(self, keys, prob: float = 0.1, degree: int = 3, coeff_range=(0.0, 0.1)):
        super().__init__(keys, prob)
        self.degree = degree
        self.coeff_range = coeff_range

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if not self.should_apply(rng):
            return sample
        out = dict(sample)
        for key in self.present_keys(sample):
            vol: Volume = sample[key]
            n = ops.num_bias_coeff(vol.ndim_spatial, self.degree)
            coeff = rng.uniform(*self.coeff_range, n).astype(np.float32)
            out[key] = _apply(vol, lambda x, c: ops.bias_field(x, c, self.degree), coeff)
        return out


class RandGibbsNoised(RandMapTransform):
    def __init__(self, keys, prob: float = 0.1, alpha=(0.0, 1.0)):
        super().__init__(keys, prob)
        self.alpha = alpha

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if not self.should_apply(rng):
            return sample
        a = np.float32(rng.uniform(*self.alpha))
        out = dict(sample)
        for key in self.present_keys(sample):
            out[key] = _apply(sample[key], ops.gibbs_noise, a)
        return out


class RandKSpaceSpikeNoised(RandMapTransform):
    def __init__(self, keys, prob: float = 0.1, intensity_range=(0.95, 1.10)):
        super().__init__(keys, prob)
        self.intensity_range = intensity_range

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        if not self.should_apply(rng):
            return sample
        out = dict(sample)
        for key in self.present_keys(sample):
            vol: Volume = sample[key]
            nd = vol.ndim_spatial
            # spike location in the mid-frequency band, away from DC
            loc = rng.uniform(0.55, 0.95, nd).astype(np.float32)
            inten = np.float32(rng.uniform(*self.intensity_range))
            out[key] = _apply(vol, ops.kspace_spike, loc, inten)
        return out


class ScaleIntensityd(MapTransform):
    """Min-max scale to [minv, maxv]."""

    def __init__(self, keys, minv: float = 0.0, maxv: float = 1.0):
        super().__init__(keys)
        self.minv, self.maxv = minv, maxv

    def __call__(self, sample: Sample) -> Sample:
        out = dict(sample)
        for key in self.present_keys(sample):
            vol: Volume = sample[key]
            data = vol.numpy().astype(np.float32)
            mn, mx = data.min(), data.max()
            if mx > mn:
                data = (data - mn) / (mx - mn) * (self.maxv - self.minv) + self.minv
            out[key] = vol.with_data(data)
        return out


# ---------------------------------------------------------------------------
# Nyul piecewise-linear histogram standardization
# ---------------------------------------------------------------------------


def interp1d(x: np.ndarray, xp: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Linear interpolation with linear *extrapolation* beyond the ends
    (np.interp clamps; Nyul standardization requires extrapolation —
    reference: src/segmantic/seg/nyul_normalize.py:10-40)."""
    x = np.asarray(x, np.float32)
    xp = np.asarray(xp, np.float64)
    fp = np.asarray(fp, np.float64)
    slopes = np.diff(fp) / np.maximum(np.diff(xp), 1e-12)
    idx = np.clip(np.searchsorted(xp, x, side="right") - 1, 0, len(xp) - 2)
    return (fp[idx] + slopes[idx] * (x - xp[idx])).astype(np.float32)


def interp1d_device(x, xp, fp):
    """Device twin of :func:`interp1d`: jittable piecewise-linear interp with
    linear extrapolation beyond the landmark range (reference has parallel
    torch+numpy paths: src/segmantic/seg/nyul_normalize.py:10-78)."""
    import jax.numpy as jnp

    x = x.astype(jnp.float32)
    xp = jnp.asarray(xp, jnp.float32)
    fp = jnp.asarray(fp, jnp.float32)
    slopes = jnp.diff(fp) / jnp.maximum(jnp.diff(xp), 1e-12)
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, xp.shape[0] - 2)
    return fp[idx] + slopes[idx] * (x - xp[idx])


def nyul_apply_device(data, quantiles, standard_scale, nonzero_mask: bool = False):
    """Jittable Nyul standardization of one volume given a fitted scale.

    Landmarks are computed on device (``nanquantile`` over the nonzero mask
    when requested) and the volume is remapped with extrapolating interp.
    """
    import jax.numpy as jnp

    data = data.astype(jnp.float32)
    q = jnp.asarray(quantiles, jnp.float32)
    if nonzero_mask:
        masked = jnp.where(data != 0, data, jnp.nan)
        landmarks = jnp.nanquantile(masked.ravel(), q)
        # all-zero volume: fall back to plain quantiles to avoid NaN landmarks
        landmarks = jnp.where(
            jnp.isnan(landmarks), jnp.quantile(data.ravel(), q), landmarks
        )
    else:
        landmarks = jnp.quantile(data.ravel(), q)
    out = interp1d_device(data.ravel(), landmarks, standard_scale).reshape(data.shape)
    if nonzero_mask:
        out = jnp.where(data != 0, out, data)
    return out


class NyulNormalize(MapTransform):
    """Piecewise-linear intensity standardization to a learned standard scale.

    ``fit()`` over a set of volumes learns mean quantile landmarks; __call__
    maps each volume's landmarks onto the standard scale (with linear
    extrapolation outside), optionally over the nonzero mask / per channel.
    jax arrays take the on-device path (:func:`nyul_apply_device`).
    """

    def __init__(
        self,
        keys="image",
        quantiles: Optional[Sequence[float]] = None,
        standard_scale: Optional[Sequence[float]] = None,
        nonzero_mask: bool = False,
        channel_wise: bool = False,
    ):
        super().__init__(keys)
        q = np.asarray(
            quantiles if quantiles is not None else np.linspace(0.01, 0.99, 11)
        )
        order = np.argsort(q, kind="stable")
        self.quantiles = q[order]
        self.standard_scale: Optional[np.ndarray] = (
            np.asarray(standard_scale, np.float64)[order]
            if standard_scale is not None
            else None
        )
        self.nonzero_mask = nonzero_mask
        self.channel_wise = channel_wise

    def _landmarks(self, data: np.ndarray) -> np.ndarray:
        sel = data[data != 0] if self.nonzero_mask else data.ravel()
        if sel.size == 0:
            sel = data.ravel()
        return np.quantile(sel, self.quantiles)

    def fit(self, volumes: Sequence[Volume]) -> "NyulNormalize":
        marks = [self._landmarks(v.numpy().astype(np.float32)) for v in volumes]
        self.standard_scale = np.mean(np.stack(marks), axis=0)
        return self

    def normalize_device(self, data):
        """On-device (jax) standardization of one array; jit-friendly."""
        if self.standard_scale is None:
            raise RuntimeError("NyulNormalize.fit() must be called before use")
        return nyul_apply_device(
            data, self.quantiles, self.standard_scale, self.nonzero_mask
        )

    def _normalize_array(self, data: np.ndarray) -> np.ndarray:
        if self.standard_scale is None:
            raise RuntimeError("NyulNormalize.fit() must be called before use")
        landmarks = self._landmarks(data)
        out = interp1d(data.ravel(), landmarks, self.standard_scale).reshape(data.shape)
        if self.nonzero_mask:
            out = np.where(data != 0, out, data)
        return out

    def __call__(self, sample: Sample) -> Sample:
        out = dict(sample)
        for key in self.present_keys(sample):
            vol: Volume = sample[key]
            data = vol.numpy().astype(np.float32)
            if self.channel_wise:
                data = np.stack([self._normalize_array(c) for c in data])
            else:
                data = self._normalize_array(data)
            out[key] = vol.with_data(data)
        return out
