from .segresnet import SegResNet
from .unet import UNet

__all__ = ["SegResNet", "UNet"]
