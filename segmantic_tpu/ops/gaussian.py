"""Separable Gaussian smoothing (jittable, channel-first).

Used by the landmark heat-map transform (reference uses MONAI
GaussianSmooth with a hard-coded .cuda(); reference:
src/segmantic/detect/transforms.py:278) and available as a general op.
Truncated separable kernels map onto the VPU as a chain of small convs
that XLA fuses.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp


def _kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = max(int(truncate * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_smooth(
    x: jax.Array, sigma: Union[float, Sequence[float]], truncate: float = 4.0
) -> jax.Array:
    """Gaussian-filter a (C, *spatial) array along every spatial axis
    (zero-padded borders, like MONAI's GaussianSmooth default)."""
    nd = x.ndim - 1
    sigmas = [float(sigma)] * nd if np.isscalar(sigma) else [float(s) for s in sigma]
    out = x.astype(jnp.float32)
    for axis in range(nd):
        if sigmas[axis] <= 0:
            continue
        k = jnp.asarray(_kernel_1d(sigmas[axis], truncate))
        # move target axis last, convolve rows, move back
        moved = jnp.moveaxis(out, axis + 1, -1)
        flat = moved.reshape(-1, moved.shape[-1])
        pad = (len(k) - 1) // 2
        padded = jnp.pad(flat, ((0, 0), (pad, pad)))
        conv = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(padded)
        out = jnp.moveaxis(conv.reshape(moved.shape), -1, axis + 1)
    return out.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else out
