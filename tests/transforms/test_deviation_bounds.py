"""Characterize the documented semantic deviations (README "Status") against
the exact semantics they deviate from, with pinned quantitative bounds
(r2 VERDICT "what's weak" #6):

1. Gibbs hard-box cutoff vs the euclidean-ball cutoff of MONAI's GibbsNoise
   (reference usage: src/segmantic/seg/monai_unet.py:205-212). The deviation
   is EXACTLY the k-space energy in the chebyshev-minus-euclidean annulus
   (Parseval), the box keeps strictly more signal than the ball, and the
   relative deviation decays to zero as alpha -> 1.
2. Exact-count batch-subset FFT augs vs MONAI's per-sample independent
   Bernoulli(prob): the per-sample marginal is round(prob*B)/B (|delta| <=
   0.5/B) and the count variance is 0 instead of B*p*(1-p).
3. (tests/infer/test_grid_quantization.py pins deviation #3.)
"""

from __future__ import annotations

import numpy as np
import pytest


def _gibbs_masks(shape, alpha):
    """Box (repo) and euclidean-ball (MONAI-family) low-pass masks, built
    independently of the repo implementation: per-axis normalized distance
    |i - (s-1)/2| / ((s-1)/2) in ifftshifted (unshifted-frequency) order."""
    radius = max(1.0 - alpha, 1e-3)
    axes = []
    for s in shape:
        c = (s - 1) / 2.0
        coord = np.abs(np.arange(s) - c) / max(c, 1.0)
        axes.append(np.fft.ifftshift(coord))
    g = np.meshgrid(*axes, indexing="ij")
    box = np.ones(shape, bool)
    for a in g:
        box &= a <= radius
    ball = np.sqrt(sum(a**2 for a in g)) <= radius
    return box, ball


def _apply_mask_oracle(x, mask):
    k = np.fft.fftn(x.astype(np.float64))
    return np.real(np.fft.ifftn(k * mask))


def test_gibbs_box_matches_independent_fft_oracle():
    """The repo's matmul-circulant gibbs_noise IS the box cutoff: pin it
    against a plain numpy FFT oracle sharing no code."""
    import jax

    from segmantic_tpu.transforms import intensity_ops as iops

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 12, 10, 11)).astype(np.float32)
    for alpha in (0.2, 0.55, 0.8):
        got = np.asarray(
            jax.jit(iops.gibbs_noise)(x, np.float32(alpha))
        ).astype(np.float64)
        box, _ = _gibbs_masks(x.shape[1:], alpha)
        want = _apply_mask_oracle(x[0], box)[None]
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_gibbs_box_vs_euclidean_ball_characterized():
    """Quantify deviation #1. At matched radius the box mask is a superset
    of the ball (chebyshev ball contains the euclidean ball), so the repo
    aug removes strictly LESS signal; the output delta satisfies Parseval
    exactly (delta energy == annulus k-energy) and its size relative to the
    aug's own effect decays with alpha — pinned at the measured values."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((24, 20, 22)).astype(np.float32)
    n = x.size

    # measured on this seed (see docstring): ratio = |box - ball| RMS over
    # |x - ball| RMS (deviation relative to the exact aug's own effect)
    expected_ratio = {0.1: 0.59, 0.3: 0.36, 0.5: 0.20, 0.7: 0.07, 0.9: 0.00}
    for alpha, exp_ratio in expected_ratio.items():
        box, ball = _gibbs_masks(x.shape, alpha)
        assert np.all(box[ball]), "box must contain the euclidean ball"
        yb = _apply_mask_oracle(x, box)
        ye = _apply_mask_oracle(x, ball)

        # Parseval: the COMPLEX field delta's energy equals the k-space
        # energy in the annulus bins exactly — the deviation is fully
        # determined by the mask difference. The augmentation's real-part
        # projection can only shed energy (the annulus is not symmetric
        # under k -> -k for even extents), so the observed output delta is
        # bounded by the annulus energy.
        k = np.fft.fftn(x.astype(np.float64))
        annulus_energy = np.sum(np.abs(k[box != ball]) ** 2) / n
        cplx_delta = np.fft.ifftn(k * (box.astype(float) - ball))
        np.testing.assert_allclose(
            np.sum(np.abs(cplx_delta) ** 2), annulus_energy, rtol=1e-9
        )
        delta_energy = np.sum((yb - ye) ** 2)
        assert delta_energy <= annulus_energy * (1 + 1e-9)

        effect = np.sqrt(np.mean((x - ye) ** 2))
        ratio = np.sqrt(np.mean((yb - ye) ** 2)) / max(effect, 1e-12)
        assert abs(ratio - exp_ratio) < 0.05, (alpha, ratio)
    # monotone: deviation vanishes as the cutoff recedes (alpha -> 1)
    ratios = list(expected_ratio.values())
    assert all(a >= b for a, b in zip(ratios, ratios[1:]))


def test_subset_fft_marginal_probability_and_count():
    """Quantify deviation #2. Exact-count subset semantics: round(p*B)
    samples per step (variance 0; MONAI's independent Bernoulli has
    variance B*p*(1-p)), per-sample marginal round(p*B)/B so the
    probability deviation is at most 0.5/B, pairing preserved."""
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.train.augment import _apply_subset_fft_aug, _subset_count

    B, trials, prob = 8, 400, 0.2
    count = _subset_count(prob, B)
    assert count == round(prob * B)
    assert abs(count / B - prob) <= 0.5 / B + 1e-12

    x = jnp.zeros((B, 1, 4, 4, 4))
    marker = lambda k, v: v + 1.0
    step = jax.jit(lambda key: _apply_subset_fft_aug(x, key, count, marker))

    hits = np.zeros(B)
    for t in range(trials):
        out = np.asarray(step(jax.random.key(t)))
        touched = out[:, 0, 0, 0, 0] > 0.5
        assert touched.sum() == count  # exact count EVERY step
        # untouched samples are bit-identical (pairing preserved)
        np.testing.assert_array_equal(out[~touched], np.asarray(x)[~touched])
        hits += touched
    freq = hits / trials
    # empirical marginal ~= count/B for every sample index (binomial CI:
    # 4 sigma with p=0.25, n=400 -> ~0.087)
    np.testing.assert_allclose(freq, count / B, atol=0.09)


def test_subset_count_rounding_bound():
    """|round(p*B)/B - p| <= 0.5/B across the configured prob range."""
    from segmantic_tpu.train.augment import _subset_count

    for B in (2, 8, 32, 96):
        for prob in np.linspace(0.0, 1.0, 21):
            c = _subset_count(float(prob), B)
            assert 0 <= c <= B
            assert abs(c / B - prob) <= 0.5 / B + 1e-12
