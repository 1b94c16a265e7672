from .resample import (
    grid_matrix,
    resample_affine_jax,
    resample_affine_np,
)

__all__ = ["grid_matrix", "resample_affine_jax", "resample_affine_np"]
