"""HTTP inference serving: NIfTI in → segmented NIfTI out.

A dependency-free production serving endpoint (stdlib http.server) around
one loaded checkpoint — a capability the reference lacks but that a
deployed segmentation framework needs. The model compiles once (first
request per volume-shape pays the XLA compile; subsequent requests reuse
the jit cache), requests are served sequentially per process (the TPU is a
single stream anyway), and the wire format is NIfTI (.nii or .nii.gz)
bytes both ways.

API:
  GET  /v1/health  -> {"status": "ok"}
  GET  /v1/info    -> model hyperparameters json
  POST /v1/segment -> body: NIfTI image; response: NIfTI label map
                      (application/gzip), same grid/affine as the input.

CLI: ``segmantic-unet serve -m model.ckpt --port 8765``.
"""

from __future__ import annotations

import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional, Sequence


class InferenceSession:
    """One loaded model + its jitted forward, shared across requests."""

    def __init__(
        self,
        model_file: Path,
        spacing: Sequence[float] = (),
        sw_batch_size: int = 4,
        overlap: float = 0.25,
    ):
        from .infer.predict import segment_volume  # noqa: F401 (validate import)
        from .train.trainer import SegmentationModel, make_val_forward

        self.model = SegmentationModel.load(Path(model_file))
        self.val_forward = make_val_forward(self.model.module)
        self.spacing = list(spacing)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self._lock = threading.Lock()  # one TPU stream: serialize inference

    @property
    def info(self) -> dict:
        return dict(self.model.hparams)

    def segment_bytes(self, payload: bytes) -> bytes:
        """NIfTI bytes in → predicted label-map NIfTI (.nii.gz) bytes out."""
        from .infer.predict import segment_volume
        from .io.nifti import read_volume, write_volume

        with tempfile.TemporaryDirectory() as td:
            in_path = Path(td) / "input.nii.gz"
            in_path.write_bytes(payload)
            vol = read_volume(in_path)

            with self._lock:
                pred, _ = segment_volume(
                    self.model,
                    vol,
                    val_forward=self.val_forward,
                    spacing=self.spacing,
                    sw_batch_size=self.sw_batch_size,
                    overlap=self.overlap,
                )

            out_path = Path(td) / "pred.nii.gz"
            write_volume(out_path, pred)
            return out_path.read_bytes()


def make_server(
    session: InferenceSession, host: str = "127.0.0.1", port: int = 8765
) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server around a session."""

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/v1/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/v1/info":
                self._json(200, session.info)
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/segment":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body; POST NIfTI bytes"})
                return
            payload = self.rfile.read(length)
            try:
                out = session.segment_bytes(payload)
            except Exception as err:  # surface decode/shape errors to client
                self._json(400, {"error": f"segmentation failed: {err}"})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/gzip")
            self.send_header("Content-Disposition",
                             'attachment; filename="pred.nii.gz"')
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    model_file: Path,
    host: str = "127.0.0.1",
    port: int = 8765,
    spacing: Sequence[float] = (),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
) -> None:
    """Load the model and serve until interrupted."""
    session = InferenceSession(
        model_file, spacing=spacing, sw_batch_size=sw_batch_size, overlap=overlap
    )
    server = make_server(session, host, port)
    print(f"serving {model_file} on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
