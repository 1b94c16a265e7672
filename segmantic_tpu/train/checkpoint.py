"""Single-file checkpoints: msgpack state + JSON metadata header.

Keeps the reference's two load-bearing conventions
(reference: src/segmantic/seg/monai_unet.py:503-509,927-930):
- filename pattern ``epoch=E-val_loss=L-val_dice=D.ckpt`` (mean-ensemble
  weights are parsed from the embedded val_dice), and
- hyperparameters persisted INSIDE the checkpoint so a model can be rebuilt
  from the file alone (Lightning's ``save_hyperparameters``).

Format: ``STPUCKP1`` magic, u64 header length, JSON header
({"hparams", "metrics"}), then ``flax.serialization`` msgpack of the
variables pytree. A ``TopKCheckpoints`` manager keeps the best-k by
val_dice (reference keeps top-3).
"""

from __future__ import annotations

import json
import re
import struct
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from flax import serialization

_MAGIC = b"STPUCKP1"


def save_checkpoint(
    path: Path,
    variables: Dict[str, Any],
    hparams: Dict[str, Any],
    metrics: Optional[Dict[str, float]] = None,
    opt_state: Any = None,
) -> None:
    payload: Dict[str, Any] = {"variables": variables}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    blob = serialization.to_bytes(payload)
    header = json.dumps(
        {"hparams": hparams, "metrics": metrics or {}, "has_opt_state": opt_state is not None}
    ).encode()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)


def load_checkpoint(path: Path) -> Dict[str, Any]:
    """→ {"variables": pytree, "hparams": dict, "metrics": dict[, "opt_state"]}.

    Arrays come back as numpy (host); shard/replicate as needed afterwards.
    """
    raw = Path(path).read_bytes()
    if raw[:8] != _MAGIC:
        raise ValueError(f"{path}: not a segmantic-tpu checkpoint")
    (hlen,) = struct.unpack("<Q", raw[8:16])
    header = json.loads(raw[16 : 16 + hlen].decode())
    payload = serialization.msgpack_restore(raw[16 + hlen :])
    out = {
        "variables": payload["variables"],
        "hparams": header["hparams"],
        "metrics": header["metrics"],
    }
    if header.get("has_opt_state"):
        out["opt_state"] = payload.get("opt_state")
    return out


def checkpoint_filename(epoch: int, val_loss: float, val_dice: float) -> str:
    return f"epoch={epoch}-val_loss={val_loss:.2f}-val_dice={val_dice:.4f}.ckpt"


_DICE_RE = re.compile(r"val_dice=([0-9]*\.?[0-9]+)")


def parse_val_dice(path: Path) -> Optional[float]:
    """Parse val_dice from a checkpoint filename (ensemble weighting)."""
    m = _DICE_RE.search(Path(path).name)
    if m:
        return float(m.group(1))
    try:  # fall back to embedded metadata
        return float(load_checkpoint(path)["metrics"].get("val_dice"))
    except Exception:
        return None


class TopKCheckpoints:
    """Keep the best-k checkpoints by val_dice (deletes evicted files)."""

    def __init__(self, output_dir: Path, k: int = 3):
        self.output_dir = Path(output_dir)
        self.k = k
        self.kept: List[Tuple[float, Path]] = []

    def update(
        self,
        epoch: int,
        val_loss: float,
        val_dice: float,
        variables: Dict[str, Any],
        hparams: Dict[str, Any],
        opt_state: Any = None,
    ) -> Optional[Path]:
        if len(self.kept) >= self.k and val_dice <= min(d for d, _ in self.kept):
            return None
        path = self.output_dir / checkpoint_filename(epoch, val_loss, val_dice)
        save_checkpoint(
            path,
            variables,
            hparams,
            metrics={"epoch": epoch, "val_loss": val_loss, "val_dice": val_dice},
            opt_state=opt_state,
        )
        self.kept.append((val_dice, path))
        self.kept.sort(key=lambda t: -t[0])
        while len(self.kept) > self.k:
            _, evicted = self.kept.pop()
            evicted.unlink(missing_ok=True)
        return path

    @property
    def best(self) -> Optional[Path]:
        return self.kept[0][1] if self.kept else None
