"""Device selection helper (API parity with the reference's make_device,
reference: src/segmantic/seg/utils.py:4-12, where gpu_ids=[-1] → CPU).

On TPU stacks the mesh normally governs placement; this helper exists for
the config surface (``gpu_ids`` keys) and single-device utilities.
"""

from __future__ import annotations

from typing import Sequence

import jax


def make_device(gpu_ids: Sequence[int] = (0,)):
    """Map a gpu_ids-style list to a jax device (-1 or empty → CPU)."""
    ids = list(gpu_ids)
    if not ids or ids[0] < 0:
        return jax.devices("cpu")[0]
    accel = jax.devices()
    return accel[min(ids[0], len(accel) - 1)]
