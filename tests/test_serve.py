"""HTTP serving endpoint: health/info/segment round-trip over a real socket."""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.io.nifti import read_volume, write_volume
from segmantic_tpu.serve import InferenceSession, make_server
from segmantic_tpu.train.trainer import SegmentationModel
from segmantic_tpu.train.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    model = SegmentationModel.create(
        num_classes=3, spatial_dims=2, spatial_size=(16, 16),
        channels=(4, 8), strides=(2,), num_res_units=1,
    )
    ckpt = root / "model.ckpt"
    save_checkpoint(ckpt, model.variables, model.hparams)

    session = InferenceSession(ckpt, sw_batch_size=2)
    srv = make_server(session, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", root
    srv.shutdown()


def test_health_and_info(server):
    base, _ = server
    with urllib.request.urlopen(f"{base}/v1/health") as r:
        assert json.loads(r.read()) == {"status": "ok"}
    with urllib.request.urlopen(f"{base}/v1/info") as r:
        info = json.loads(r.read())
    assert info["num_classes"] == 3
    assert info["spatial_dims"] == 2


def test_segment_roundtrip(server, tmp_path):
    base, _ = server
    rng = np.random.default_rng(0)
    img = rng.standard_normal((24, 20)).astype(np.float32)
    aff = affine_from_spacing_origin((1.0, 1.5), (2.0, -1.0))
    in_path = tmp_path / "in.nii.gz"
    write_volume(in_path, Volume(data=img[None], affine=aff))

    req = urllib.request.Request(
        f"{base}/v1/segment", data=in_path.read_bytes(), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        out_bytes = r.read()

    out_path = tmp_path / "pred.nii.gz"
    out_path.write_bytes(out_bytes)
    pred = read_volume(out_path)
    # prediction lands on the ORIGINAL grid and affine with valid labels
    assert pred.spatial_shape == (24, 20)
    np.testing.assert_allclose(pred.affine, aff, atol=1e-4)
    assert set(np.unique(pred.numpy())) <= {0, 1, 2}


def test_segment_bad_body_is_400(server):
    base, _ = server
    req = urllib.request.Request(
        f"{base}/v1/segment", data=b"not a nifti", method="POST"
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "failed" in json.loads(e.read())["error"]


def test_unknown_path_404(server):
    base, _ = server
    try:
        urllib.request.urlopen(f"{base}/v1/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404



def test_empty_post_body_is_400(server):
    base, _ = server
    req = urllib.request.Request(f"{base}/v1/segment", data=b"", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "empty body" in json.loads(e.read())["error"]


def test_post_unknown_path_is_404(server):
    base, _ = server
    req = urllib.request.Request(f"{base}/v1/nope", data=b"x", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 404
