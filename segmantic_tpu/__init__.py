"""segmantic-tpu: a TPU-native 3D medical-image segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of dyollb/segmantic
(reference surveyed in SURVEY.md): the ``segmantic-unet`` CLI and yml/json
config surface, MSD/nnUNet-style datalists, residual 2D/3D UNets, on-device
fused preprocessing + augmentation, sliding-window Gaussian-blend inference,
ensembling, k-fold cross-validation, metrics, and landmark-detection
transforms — designed TPU-first (SPMD over device meshes, functional
transforms, static shapes, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"

# NOTE: no "train" alias — it would collide with the segmantic_tpu.train
# subpackage (module attributes shadow module __getattr__)
_LAZY = {
    "Volume": ("segmantic_tpu.core.volume", "Volume"),
    "UNet": ("segmantic_tpu.models.unet", "UNet"),
    "train_model": ("segmantic_tpu.train.trainer", "train"),
    "predict": ("segmantic_tpu.infer.predict", "predict"),
    "cross_validate": ("segmantic_tpu.train.cross_validate", "cross_validate"),
    "ensemble_creator": ("segmantic_tpu.infer.ensemble", "ensemble_creator"),
    "SegmentationModel": ("segmantic_tpu.train.trainer", "SegmentationModel"),
    "sliding_window_inference": (
        "segmantic_tpu.infer.sliding_window",
        "sliding_window_inference",
    ),
    "read_volume": ("segmantic_tpu.io.nifti", "read_volume"),
    "write_volume": ("segmantic_tpu.io.nifti", "write_volume"),
}


def __getattr__(name):  # lazy top-level API (keeps CLI startup light)
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'segmantic_tpu' has no attribute {name!r}")
