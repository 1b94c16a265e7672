"""MRI/CT modality preparation: N4 bias-field correction, CT scaling.

Replaces the reference's ITK filter chain
(reference: src/segmantic/image/modality.py:4-49) with a from-scratch
implementation: Otsu thresholding, median filtering and an N4-style
iterative bias-field estimator (log-domain histogram sharpening + smooth
field fit, multi-resolution) in numpy/scipy — host-side prep tooling, not
the training hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy import ndimage

from ..core.volume import Volume
from ..ops.resample import resample_affine_np


def otsu_threshold(data: np.ndarray, bins: int = 200) -> float:
    """Otsu's threshold over the intensity histogram."""
    hist, edges = np.histogram(data.ravel(), bins=bins)
    centers = (edges[:-1] + edges[1:]) / 2
    w = hist.astype(np.float64)
    total = w.sum()
    best_t, best_var = centers[0], -1.0
    cum_w = np.cumsum(w)
    cum_mean = np.cumsum(w * centers)
    mean_total = cum_mean[-1] / total
    for i in range(1, bins):
        w0 = cum_w[i - 1]
        w1 = total - w0
        if w0 == 0 or w1 == 0:
            continue
        m0 = cum_mean[i - 1] / w0
        m1 = (cum_mean[-1] - cum_mean[i - 1]) / w1
        var_between = w0 * w1 * (m0 - m1) ** 2
        if var_between > best_var:
            best_var = var_between
            best_t = centers[i]
    return float(best_t)


def otsu_mask(image: Volume, bins: int = 200) -> Volume:
    """Foreground mask via Otsu thresholding (foreground = above threshold)."""
    data = image.numpy().astype(np.float32)
    t = otsu_threshold(data, bins)
    return image.with_data((data > t).astype(np.uint8))


def _shrink(data: np.ndarray, factor: int) -> np.ndarray:
    """Subsample a channel-first array by an integer factor."""
    sl = (slice(None),) + (slice(None, None, factor),) * (data.ndim - 1)
    return np.ascontiguousarray(data[sl])


def _sharpen_histogram(
    log_data: np.ndarray,
    mask: np.ndarray,
    num_bins: int = 200,
    fwhm: float = 0.15,
    wiener_noise: float = 0.01,
) -> np.ndarray:
    """N4 core step: Wiener-deconvolve the log-intensity histogram with a
    Gaussian of given FWHM and return the expected 'sharpened' value per voxel.
    """
    vals = log_data[mask]
    lo, hi = float(vals.min()), float(vals.max())
    if hi <= lo:
        return log_data.copy()
    scale = (num_bins - 1) / (hi - lo)
    # linear-binned histogram with fractional assignment
    pos = (vals - lo) * scale
    idx = np.floor(pos).astype(np.int64)
    frac = pos - idx
    hist = np.bincount(idx, weights=1 - frac, minlength=num_bins + 1)
    hist += np.bincount(
        np.minimum(idx + 1, num_bins), weights=frac, minlength=num_bins + 1
    )
    hist = hist[:num_bins]

    # Gaussian kernel in histogram space
    sigma = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0))) * scale
    n_fft = 2 * num_bins
    f_hist = np.fft.rfft(hist, n_fft)
    x = np.arange(n_fft)
    x = np.minimum(x, n_fft - x)
    g = np.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    g /= g.sum()
    f_g = np.fft.rfft(g, n_fft)
    # Wiener deconvolution
    f_u = f_hist * np.conj(f_g) / (np.abs(f_g) ** 2 + wiener_noise)
    u = np.maximum(np.fft.irfft(f_u, n_fft)[:num_bins], 0.0)

    # E[u | v]: smooth the sharpened distribution back and take expectation
    centers = lo + np.arange(num_bins) / scale
    num = np.fft.irfft(np.fft.rfft(u * centers, n_fft) * f_g, n_fft)[:num_bins]
    den = np.fft.irfft(np.fft.rfft(u, n_fft) * f_g, n_fft)[:num_bins]
    expected = np.where(den > 1e-12, num / np.maximum(den, 1e-12), centers)

    # map each voxel's value to expected sharpened value
    out = log_data.copy()
    pos_all = np.clip((log_data[mask] - lo) * scale, 0, num_bins - 1 - 1e-6)
    i0 = np.floor(pos_all).astype(np.int64)
    w = pos_all - i0
    out[mask] = expected[i0] * (1 - w) + expected[np.minimum(i0 + 1, num_bins - 1)] * w
    return out


def bias_correct(
    input: Volume,
    mask: Optional[Volume] = None,
    shrink_factor: int = 4,
    num_fitting_levels: int = 4,
    num_iterations: int = 50,
    convergence_threshold: float = 1e-3,
) -> Volume:
    """N4-style MRI bias-field correction.

    Estimates a smooth multiplicative bias field on a shrunk copy
    (log-domain, iterative histogram sharpening + Gaussian-smoothed residual
    field over ``num_fitting_levels`` scales), then divides the full-
    resolution image by the upsampled field — mirroring the reference's
    shrink + GetLogBiasFieldAsImage + divide flow
    (reference: src/segmantic/image/modality.py:17-31).
    """
    full = input.numpy().astype(np.float32)
    if mask is None:
        mask_arr = (full > otsu_threshold(full)).astype(np.uint8)
    else:
        mask_arr = (mask.numpy() > 0).astype(np.uint8)

    small = _shrink(full, shrink_factor)
    small_mask = _shrink(mask_arr, shrink_factor).astype(bool)

    eps = 1e-6
    positive = small > eps
    log_small = np.where(positive, np.log(np.maximum(small, eps)), 0.0)
    m = small_mask & positive

    log_bias = np.zeros_like(log_small)
    current = log_small.copy()
    nd = small.ndim - 1
    base_sigma = max(max(small.shape[1:]) / 8.0, 2.0)

    for level in range(num_fitting_levels):
        sigma = base_sigma / (2**level)
        for _ in range(max(num_iterations // num_fitting_levels, 1)):
            sharpened = _sharpen_histogram(current, m)
            residual = np.where(m, current - sharpened, 0.0)
            # smooth-field fit: normalized Gaussian smoothing within the mask
            weight = m.astype(np.float32)
            smooth_r = np.empty_like(residual)
            for c in range(residual.shape[0]):
                num_s = ndimage.gaussian_filter(residual[c] * weight[c], sigma)
                den_s = ndimage.gaussian_filter(weight[c], sigma)
                smooth_r[c] = np.where(den_s > 1e-6, num_s / np.maximum(den_s, 1e-6), 0)
            log_bias = log_bias + smooth_r
            new = log_small - log_bias
            change = float(np.abs(new - current)[m].std()) if m.any() else 0.0
            current = new
            if change < convergence_threshold:
                break

    # upsample log bias field to full resolution via the shared resampler
    scale = np.eye(nd, nd + 1)
    for a in range(nd):
        scale[a, a] = (small.shape[1 + a] - 1) / max(full.shape[1 + a] - 1, 1)
    log_bias_full = resample_affine_np(log_bias, scale, full.shape[1:], order=1)

    corrected = full / np.exp(log_bias_full).astype(np.float32)
    return input.with_data(corrected)


def median_filter(image: Volume, radius: int = 1) -> Volume:
    data = image.numpy()
    size = (1,) + (2 * radius + 1,) * (data.ndim - 1)
    return image.with_data(ndimage.median_filter(data, size=size))


def scale_clamp_ct(img: Volume) -> Volume:
    """Prepare CT: median filter → clamp [-1100, 3100] → scale to [0, 255]."""
    out = median_filter(img, radius=1)
    data = np.clip(out.numpy().astype(np.float32), -1100.0, 3100.0)
    data = (data + 1100.0) * (255.0 / (1100.0 + 3100.0))
    return out.with_data(data)


def unscale_ct(img: Volume) -> Volume:
    """Invert :func:`scale_clamp_ct` (except the clamping)."""
    data = img.numpy().astype(np.float32) * ((1100.0 + 3100.0) / 255.0) - 1100.0
    return img.with_data(data)
