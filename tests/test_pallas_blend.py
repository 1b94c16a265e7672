"""Pallas blend-accumulate kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles and runs on TPU ~5x faster than XLA)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmantic_tpu.infer.sliding_window import (
    _accumulate,
    gaussian_importance,
    window_starts,
)
from segmantic_tpu.ops.pallas_blend import (
    accumulate_windows_pallas,
    alignment_quanta,
    padded_channels,
    pick_tile,
    supports_roi,
)


def test_pick_tile_and_alignment_helpers():
    assert 96 % pick_tile(96, 96, 96, 8) == 0
    assert pick_tile(16, 16, 16, 2) == 16
    assert padded_channels(3) == 4
    assert padded_channels(8) == 8
    assert alignment_quanta(8) == (8, 16)
    assert supports_roi((96, 96, 96), 8)  # 96*8 = 768 = 6*128
    assert not supports_roi((96, 96, 96), 1)  # 96 % 128 != 0


def test_window_starts_alignment():
    starts = window_starts((192, 160, 160), (96, 96, 96), 0.25, align=(1, 8, 16))
    assert all(s[1] % 8 == 0 and s[2] % 16 == 0 for s in starts)
    assert max(s[0] for s in starts) + 96 == 192


def test_pallas_blend_matches_xla():
    rng = np.random.default_rng(0)
    vol_shape = (24, 24, 16)
    roi = (8, 8, 8)
    c = 16  # 8*16 = 128-aligned lane dim
    b = 4

    starts = np.stack(
        [
            rng.integers(0, (vol_shape[0] - roi[0]) // 8 + 1, b) * 8,
            rng.integers(0, (vol_shape[1] - roi[1]) // 8 + 1, b) * 8,
            rng.integers(0, (vol_shape[2] - roi[2]) // 8 + 1, b) * 8,
        ],
        axis=1,
    ).astype(np.int32)
    logits = rng.standard_normal((b,) + roi + (c,)).astype(np.float32)
    importance = gaussian_importance(roi)

    acc0 = jnp.zeros(vol_shape + (c,), jnp.float32)
    wacc0 = jnp.zeros(vol_shape + (1,), jnp.float32)
    want_acc, _ = _accumulate(
        acc0, wacc0, jnp.asarray(logits), jnp.asarray(importance), jnp.asarray(starts)
    )

    got_acc = accumulate_windows_pallas(
        acc0,
        jnp.asarray(logits),
        jnp.asarray(importance),
        jnp.asarray(starts),
        tile=pick_tile(*roi, c),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_acc), np.asarray(want_acc), atol=1e-5)


def test_pallas_blend_overlapping_windows():
    # heavy overlap — serial grid RMW must accumulate all contributions
    roi = (8, 8, 8)
    c = 16
    b = 6
    starts = np.zeros((b, 3), np.int32)
    starts[:, 0] = [0, 0, 8, 8, 8, 8]
    logits = np.ones((b,) + roi + (c,), np.float32)
    importance = np.ones(roi, np.float32)
    acc0 = jnp.zeros((16, 8, 8, c), jnp.float32)
    got = accumulate_windows_pallas(
        acc0, jnp.asarray(logits), jnp.asarray(importance),
        jnp.asarray(starts), tile=8, interpret=True,
    )
    assert float(got[0, 0, 0, 0]) == 2.0  # rows 0..7: the 2 windows at start 0
    assert float(got[8, 0, 0, 0]) == 4.0  # rows 8..15: the 4 windows at start 8
