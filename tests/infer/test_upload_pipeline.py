"""Pipelined-upload sliding window: correctness vs the blob path.

The slab-pipelined upload (upload_pipeline=True) and the bf16 wire dtype
exist to overlap/shrink the host->device transfer (r2 VERDICT #4: 51.8 vs
212.8 vols/min end-to-end vs device-resident). They must not change the
result: same grid, same gather, same blend — only the transfer schedule
differs. reference hot loop: src/segmantic/seg/monai_unet.py:637-639.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from segmantic_tpu.infer.sliding_window import sliding_window_inference


def _predictor(windows):
    # cheap deterministic "model": 3 channels derived from the input
    w = windows.astype(jnp.float32)
    return jnp.concatenate([w, w * 2.0, w - 1.0], axis=-1)


@pytest.mark.parametrize("shape", [(40, 28, 24), (16, 16, 16)])
def test_pipeline_matches_blob(shape):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal(shape + (1,)).astype(np.float32)
    kw = dict(
        roi_size=(16, 16, 16), sw_batch_size=3, predictor=_predictor,
        overlap=0.25, num_classes=3,
    )
    blob = np.asarray(
        sliding_window_inference(vol, upload_pipeline=False, **kw)
    )
    piped = np.asarray(
        sliding_window_inference(vol, upload_pipeline=True, **kw)
    )
    assert blob.shape == piped.shape == shape + (3,)
    np.testing.assert_allclose(piped, blob, rtol=2e-6, atol=2e-6)


def test_pipeline_num_classes_probe():
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((20, 18, 17, 1)).astype(np.float32)
    out = sliding_window_inference(
        vol, (16, 16, 16), 2, _predictor, overlap=0.25,
        num_classes=None, upload_pipeline=True,
    )
    assert out.shape == (20, 18, 17, 3)


def test_bf16_wire_dtype_tolerance():
    """bf16 wire changes only the input quantization: the bf16 model reads
    bf16 windows either way, so the blended logits move by O(input eps).
    Characterized bound: |delta| <= 2^-8 * scale of the f32 path."""
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((24, 20, 18, 1)).astype(np.float32)
    kw = dict(
        roi_size=(16, 16, 16), sw_batch_size=4, predictor=_predictor,
        overlap=0.25, num_classes=3,
    )
    f32 = np.asarray(sliding_window_inference(vol, **kw))
    bf16 = np.asarray(
        sliding_window_inference(
            vol, wire_dtype=jnp.bfloat16, upload_pipeline=True, **kw
        )
    )
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() <= 2 ** -8 * scale * 2.5
