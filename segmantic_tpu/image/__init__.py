from . import labels, modality, processing

__all__ = ["labels", "modality", "processing"]
