"""Ensemble combination transforms on label and one-hot data (mirrors
reference tests/seg/test_transforms.py:8-39)."""

import numpy as np

from segmantic_tpu.core.volume import Volume
from segmantic_tpu.transforms.post import (
    MeanEnsembled,
    SelectBestEnsembled,
    VoteEnsembled,
)


def _vol(arr):
    return Volume(data=np.asarray(arr))


def test_select_best_on_label_data():
    # model 0 predicts tissue 1 well, model 1 predicts tissue 2 well
    pred0 = np.zeros((1, 4, 4), np.int64)
    pred0[0, 0, :] = 1
    pred1 = np.zeros((1, 4, 4), np.int64)
    pred1[0, 1, :] = 2
    sample = {"pred0": _vol(pred0), "pred1": _vol(pred1)}
    out = SelectBestEnsembled(
        keys=["pred0", "pred1"], output_key="pred",
        label_model_dict={1: 0, 2: 1},
    )(sample)
    merged = out["pred"].numpy()
    assert np.all(merged[0, 0, :] == 1)  # tissue 1 from model 0
    assert np.all(merged[0, 1, :] == 2)  # tissue 2 from model 1
    assert np.all(merged[0, 2:, :] == 0)


def test_select_best_on_onehot_data():
    def onehot(lbl, n=3):
        return np.stack([(lbl == c) for c in range(n)]).astype(np.float32)

    lbl0 = np.zeros((4, 4), np.int64)
    lbl0[0, :] = 1
    lbl1 = np.zeros((4, 4), np.int64)
    lbl1[1, :] = 2
    sample = {"pred0": _vol(onehot(lbl0)), "pred1": _vol(onehot(lbl1))}
    out = SelectBestEnsembled(
        keys=["pred0", "pred1"], output_key="pred",
        label_model_dict={1: 0, 2: 1},
    )(sample)
    merged = out["pred"].numpy()
    assert merged.shape == (3, 4, 4)  # back to one-hot
    assert np.all(merged[1, 0, :] == 1)
    assert np.all(merged[2, 1, :] == 1)


def test_mean_ensembled_weighted():
    a = np.zeros((2, 2, 2), np.float32)
    a[1] = 1.0  # class-1 logits
    b = np.zeros((2, 2, 2), np.float32)
    b[0] = 1.0
    out = MeanEnsembled(
        keys=["pred0", "pred1"], output_key="pred", weights=[3.0, 1.0]
    )({"pred0": _vol(a), "pred1": _vol(b)})
    m = out["pred"].numpy()
    np.testing.assert_allclose(m[1], 0.75)
    np.testing.assert_allclose(m[0], 0.25)


def test_vote_ensembled_majority():
    p0 = np.full((1, 2, 2), 1, np.int64)
    p1 = np.full((1, 2, 2), 1, np.int64)
    p2 = np.full((1, 2, 2), 2, np.int64)
    out = VoteEnsembled(
        keys=["pred0", "pred1", "pred2"], output_key="pred", num_classes=3
    )({"pred0": _vol(p0), "pred1": _vol(p1), "pred2": _vol(p2)})
    assert np.all(out["pred"].numpy() == 1)
