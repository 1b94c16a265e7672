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
