import json
from pathlib import Path

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.detect.transforms import (
    BoundingBoxd,
    EmbedVert,
    ExtractVertPosition,
    LoadVert,
    SaveVert,
    VertHeatMap,
)


@pytest.fixture
def landmarks(tmp_path: Path) -> Path:
    p = tmp_path / "verts.json"
    p.write_text(json.dumps({"C1": [1.0, 2.0, 3.0], "C2": [4.0, 5.0, 6.0]}))
    return p


@pytest.fixture
def rotated_ref() -> Volume:
    # non-identity direction matrix to exercise the affine math
    theta = 0.3
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    aff = affine_from_spacing_origin((1.0, 1.5, 2.0), (5.0, -3.0, 1.0), direction=rot)
    return Volume(data=np.zeros((1, 16, 16, 16), np.float32), affine=aff)


def test_load_vert_named(landmarks):
    d = LoadVert(keys="verts")({"verts": landmarks})
    assert set(d["verts"].keys()) == {1, 2}
    np.testing.assert_allclose(d["verts"][1], [1, 2, 3])
    assert d["verts_meta_dict"]["id_map"] == {"C1": 1, "C2": 2}


def test_load_vert_numeric(tmp_path):
    p = tmp_path / "v.json"
    p.write_text(json.dumps({"3": [0.0, 0.0, 0.0], "7": [1.0, 1.0, 1.0]}))
    d = LoadVert(keys="verts")({"verts": p})
    assert set(d["verts"].keys()) == {3, 7}


def test_save_vert_roundtrip(landmarks, tmp_path):
    d = LoadVert(keys="verts")({"verts": landmarks})
    out_dir = tmp_path / "out"
    SaveVert(keys="verts", output_dir=out_dir, separate_folder=False)(d)
    saved = list(out_dir.glob("*.json"))
    assert len(saved) == 1
    data = json.loads(saved[0].read_text())
    assert data == {"C1": [1.0, 2.0, 3.0], "C2": [4.0, 5.0, 6.0]}


def test_embed_extract_roundtrip(rotated_ref):
    """physical → voxel (embed) → heatmap → peak → physical recovers the
    original coordinates to within voxel rounding (reference round-trip
    test: tests/detect/test_vert_transforms.py:89-118)."""
    # choose landmarks at exact voxel positions to avoid rounding error
    idx1, idx2 = np.array([3, 4, 5]), np.array([10, 8, 12])
    aff = rotated_ref.affine
    p1 = aff[:3, :3] @ idx1 + aff[:3, 3]
    p2 = aff[:3, :3] @ idx2 + aff[:3, 3]
    sample = {
        "verts": {1: p1, 2: p2},
        "image": rotated_ref,
    }
    d = EmbedVert(keys="verts", ref_key="image")(sample)
    emb = d["verts"]
    assert isinstance(emb, Volume)
    assert emb.numpy()[0, 3, 4, 5] == 1
    assert emb.numpy()[0, 10, 8, 12] == 2

    d = VertHeatMap(keys="verts", gamma=1000.0, label_names=["C1", "C2"])(d)
    heat = d["verts"]
    assert heat.numpy().shape == (3, 16, 16, 16)
    assert heat.numpy().max() == pytest.approx(1000.0)

    d = ExtractVertPosition(keys="verts", threshold=0.5)(d)
    out = d["verts"]
    np.testing.assert_allclose(out[1], p1, atol=1e-4)
    np.testing.assert_allclose(out[2], p2, atol=1e-4)


def test_bounding_box():
    lbl = np.zeros((1, 8, 8, 8), np.int32)
    lbl[0, 2:5, 3:6, 1:7] = 1
    vol = Volume(data=lbl)
    d = BoundingBoxd(keys="label")({"label": vol})
    assert d["result"]["bbox"] == [[2, 3, 1], [5, 6, 7]]
