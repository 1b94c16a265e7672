"""Characterize documented deviation #3 (r2 VERDICT): the sliding-window
start grid is quantized to the Pallas blend kernel's alignment quanta
(strides rounded DOWN to a multiple of q, volume padded up so the snapped
last start is aligned) instead of MONAI's exact stride = roi*(1-overlap)
(reference hot loop: src/segmantic/seg/monai_unet.py:637-639).

The quantized grid is a DENSER cover of the same window family — every
voxel is still seen by >= 1 window and strides only shrink — so blended
outputs differ only through which window centers weight each voxel. This
test pins that output delta with an adversarial predictor whose logits
depend on position-within-window (for any predictor that is a pure
function of absolute position, ANY covering grid blends identically — the
deviation is zero by construction; edge-varying predictors are the worst
case)."""

from __future__ import annotations

import numpy as np

from segmantic_tpu.infer.sliding_window import gaussian_importance, window_starts
from segmantic_tpu.ops.pallas_blend import alignment_quanta


def _blend(spatial, starts, roi, predictor, n_classes):
    w = gaussian_importance(roi).astype(np.float64)
    acc = np.zeros(tuple(spatial) + (n_classes,))
    wacc = np.zeros(tuple(spatial) + (1,))
    for s in starts:
        sl = tuple(slice(s[a], s[a] + roi[a]) for a in range(3))
        acc[sl] += w[..., None] * predictor(s)
        wacc[sl] += w[..., None]
    assert wacc.min() > 0, "grid must cover every voxel"
    return acc / wacc


def test_quantized_grid_output_delta_bounded():
    roi = (16, 16, 16)
    spatial = (40, 44, 36)
    n_classes = 8
    overlap = 0.25
    q1, q2 = alignment_quanta(n_classes)
    assert (q1, q2) == (8, 16)
    align = (1, q1, q2)

    # exact MONAI grid on the unpadded volume
    starts_exact = window_starts(spatial, roi, overlap)

    # production alignment recipe: pad high side to a quantum multiple
    padded = list(spatial)
    for a, q in enumerate(align):
        if q > 1:
            padded[a] += (-spatial[a]) % q
    starts_q = window_starts(padded, roi, overlap, align=align)

    # stride only shrinks (denser cover), starts stay aligned
    ex1 = sorted({s[1] for s in starts_exact})
    qs1 = sorted({s[1] for s in starts_q})
    assert len(qs1) >= len(ex1)
    assert all(s % q1 == 0 for s in qs1)
    assert all(s[2] % q2 == 0 for s in starts_q)

    # adversarial predictor: logits = f(absolute voxel) * g(within-window)
    rel = np.meshgrid(*[np.arange(r) / (r - 1) for r in roi], indexing="ij")
    edge_mod = 1.0 + 0.3 * np.cos(np.pi * rel[0]) * np.cos(np.pi * rel[2])
    cls_phase = np.arange(n_classes) * 0.7

    def predictor(start):
        axes = [start[a] + np.arange(roi[a]) for a in range(3)]
        g = np.meshgrid(*axes, indexing="ij")
        base = np.sin(0.11 * g[0] + 0.07 * g[1] + 0.13 * g[2])
        return (
            np.sin(base[..., None] * 2.0 + cls_phase) * edge_mod[..., None]
        )

    out_exact = _blend(spatial, starts_exact, roi, predictor, n_classes)
    crop = tuple(slice(0, s) for s in spatial)
    out_q = _blend(padded, starts_q, roi, predictor, n_classes)[crop]

    def softmax(z):
        z = z - z.max(-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(-1, keepdims=True)

    p_exact, p_q = softmax(out_exact), softmax(out_q)
    max_prob_delta = np.abs(p_exact - p_q).max()
    mean_prob_delta = np.abs(p_exact - p_q).mean()
    agree = (p_exact.argmax(-1) == p_q.argmax(-1)).mean()

    # pinned characterization: even with +-30% edge-dependent logit
    # modulation the blended probabilities move <= 0.108 max / 0.0046 mean
    # and the argmax labels agree EVERYWHERE (measured on this
    # construction); real models are far less edge-sensitive than this
    # adversary
    assert max_prob_delta < 0.13, max_prob_delta
    assert mean_prob_delta < 0.01, mean_prob_delta
    assert agree > 0.995, agree


def test_quantized_grid_is_identity_for_position_pure_predictors():
    """For a predictor that is a pure function of absolute position the
    quantized and exact grids blend to EXACTLY the same output — the
    deviation lives only in window-edge-dependent predictor behavior."""
    roi = (16, 16, 16)
    spatial = (40, 44, 36)
    overlap = 0.25
    # 8 padded classes: quanta (8, 16); supports_roi(roi, 8) holds, so this
    # is a configuration the Pallas blend actually accepts
    align = (1,) + alignment_quanta(8)
    padded = [s + ((-s) % q if q > 1 else 0) for s, q in zip(spatial, align)]

    def predictor(start):
        axes = [start[a] + np.arange(roi[a]) for a in range(3)]
        g = np.meshgrid(*axes, indexing="ij")
        return np.stack(
            [np.sin(0.1 * g[0] + 0.05 * g[1]), np.cos(0.08 * g[2]),
             0.2 * g[0] - 0.1 * g[1], np.sin(0.03 * g[0] * 1.7)], axis=-1
        )

    out_exact = _blend(spatial, window_starts(spatial, roi, overlap), roi,
                       predictor, 4)
    crop = tuple(slice(0, s) for s in spatial)
    out_q = _blend(padded, window_starts(padded, roi, overlap, align=align),
                   roi, predictor, 4)[crop]
    np.testing.assert_allclose(out_q, out_exact, atol=1e-12)
