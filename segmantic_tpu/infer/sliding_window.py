"""Sliding-window inference with Gaussian-blended overlap accumulation.

Replaces MONAI's ``sliding_window_inference`` / ``SlidingWindowInferer``
(reference: src/segmantic/seg/monai_unet.py:352-356,637-639,840-842).
TPU-shaped: the window grid is computed once on the host (static window
count per volume shape), windows are gathered with ``lax.dynamic_slice``
inside one jitted step that runs ``sw_batch_size`` windows per forward, and
the logits·weight accumulation is a jitted read-modify-write with traced
window offsets — one compile per (volume shape, roi) pair, with the whole
volume and both accumulators resident in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def window_starts(
    image_size: Sequence[int], roi_size: Sequence[int], overlap: float
) -> List[Tuple[int, ...]]:
    """Window origin grid (MONAI convention): stride = roi * (1 - overlap),
    last window snapped so it ends exactly at the image edge."""
    nd = len(image_size)
    per_axis: List[List[int]] = []
    for a in range(nd):
        size, roi = image_size[a], roi_size[a]
        if roi >= size:
            per_axis.append([0])
            continue
        stride = max(int(roi * (1.0 - overlap)), 1)
        starts = list(range(0, size - roi + 1, stride))
        if starts[-1] != size - roi:
            starts.append(size - roi)
        per_axis.append(starts)
    grids = np.meshgrid(*per_axis, indexing="ij")
    return [tuple(int(g.flat[i]) for g in grids) for i in range(grids[0].size)]


def gaussian_importance(roi_size: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian window-importance map (MONAI's blend weights)."""
    maps = []
    for s in roi_size:
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-3)
        x = np.arange(s, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = maps[0]
    for m in maps[1:]:
        w = np.multiply.outer(w, m)
    w = np.maximum(w, w.max() * 1e-3)  # avoid zero weights at corners
    return w.astype(np.float32)


@partial(jax.jit, static_argnames=("roi", "nd"))
def _gather_windows(volume: jax.Array, starts: jax.Array, roi: Tuple[int, ...], nd: int):
    """volume (*spatial, C), starts (B, nd) → windows (B, *roi, C)."""

    def one(s):
        idx = tuple(s[a] for a in range(nd)) + (0,)
        return jax.lax.dynamic_slice(volume, idx, tuple(roi) + (volume.shape[-1],))

    return jax.vmap(one)(starts)


@jax.jit
def _accumulate(acc, weight_acc, logits, importance, starts):
    """Scatter-add logits*importance (and importance) at window offsets."""
    nd = starts.shape[1]

    def body(i, carry):
        acc_, w_ = carry
        s = starts[i]
        idx = tuple(s[a] for a in range(nd)) + (0,)
        roi_c = logits.shape[1:]
        cur = jax.lax.dynamic_slice(acc_, idx, roi_c)
        upd = cur + logits[i] * importance[..., None]
        acc_ = jax.lax.dynamic_update_slice(acc_, upd, idx)
        wcur = jax.lax.dynamic_slice(w_, idx[:-1] + (0,), roi_c[:-1] + (1,))
        w_ = jax.lax.dynamic_update_slice(
            w_, wcur + importance[..., None], idx[:-1] + (0,)
        )
        return acc_, w_

    return jax.lax.fori_loop(0, logits.shape[0], body, (acc, weight_acc))


def sliding_window_inference(
    volume,  # (*spatial, C) array (np or jnp)
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable,  # (B, *roi, C) -> (B, *roi, num_classes)
    overlap: float = 0.25,
    mode: str = "gaussian",
    num_classes: Optional[int] = None,
) -> jax.Array:
    """Run tiled inference over an arbitrarily-sized volume.

    Returns (*spatial, num_classes) blended logits. The volume is zero-padded
    up to the roi when smaller (result cropped back).
    """
    volume = jnp.asarray(volume)
    nd = len(roi_size)
    spatial = volume.shape[:nd]

    pad = [max(roi_size[a] - spatial[a], 0) for a in range(nd)]
    if any(pad):
        lo = [p // 2 for p in pad]
        widths = [(lo[a], pad[a] - lo[a]) for a in range(nd)] + [(0, 0)]
        volume = jnp.pad(volume, widths)
    padded = volume.shape[:nd]

    starts = window_starts(padded, roi_size, overlap)
    if mode == "gaussian":
        importance = jnp.asarray(gaussian_importance(roi_size))
    else:
        importance = jnp.ones(tuple(roi_size), jnp.float32)

    # probe classes with one window if not given
    first = _gather_windows(
        volume, jnp.zeros((1, nd), jnp.int32), tuple(roi_size), nd
    )
    probe = predictor(first)
    n_classes = probe.shape[-1] if num_classes is None else num_classes

    acc = jnp.zeros(tuple(padded) + (n_classes,), jnp.float32)
    wacc = jnp.zeros(tuple(padded) + (1,), jnp.float32)

    all_starts = np.asarray(starts, np.int32)
    n = len(starts)
    for i in range(0, n, sw_batch_size):
        chunk = all_starts[i : i + sw_batch_size]
        if len(chunk) < sw_batch_size:  # pad to static batch, weight dupes once
            reps = sw_batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], reps, axis=0)])
            windows = _gather_windows(volume, jnp.asarray(chunk), tuple(roi_size), nd)
            logits = predictor(windows)
            logits = logits[: sw_batch_size - reps]
            chunk = chunk[: sw_batch_size - reps]
            acc, wacc = _accumulate(
                acc, wacc, logits, importance, jnp.asarray(chunk)
            )
        else:
            windows = _gather_windows(volume, jnp.asarray(chunk), tuple(roi_size), nd)
            logits = predictor(windows)
            acc, wacc = _accumulate(acc, wacc, logits, importance, jnp.asarray(chunk))

    out = acc / wacc
    if any(pad):
        lo = [p // 2 for p in pad]
        sl = tuple(slice(lo[a], lo[a] + spatial[a]) for a in range(nd)) + (
            slice(None),
        )
        out = out[sl]
    return out


class SlidingWindowInferer:
    """Callable wrapper with fixed roi/sw_batch/overlap (MONAI-style API)."""

    def __init__(
        self,
        roi_size: Sequence[int],
        sw_batch_size: int = 4,
        overlap: float = 0.25,
        mode: str = "gaussian",
    ):
        self.roi_size = list(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode

    def __call__(self, volume, predictor: Callable):
        return sliding_window_inference(
            volume,
            self.roi_size,
            self.sw_batch_size,
            predictor,
            overlap=self.overlap,
            mode=self.mode,
        )
