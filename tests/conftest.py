"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-device sharding paths are tested on CPU via
``--xla_force_host_platform_device_count`` — no TPU cluster needed.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may point at a TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize registers a TPU backend and overrides
# jax_platforms directly — force CPU via jax.config before any device use.
# SEGMANTIC_FORCE_PLATFORM propagates the same to subprocesses (cross-val).
os.environ["SEGMANTIC_FORCE_PLATFORM"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable without installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Persistent XLA compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def labelfield() -> "np.ndarray":
    """Synthetic 5x5x5 volume where voxel value == z-slice index."""
    arr = np.zeros((5, 5, 5), dtype=np.uint16)
    for z in range(5):
        arr[z, :, :] = z
    return arr
