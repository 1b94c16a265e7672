from .volume import Volume
from . import orientation

__all__ = ["Volume", "orientation"]
