from .overlap import confusion_matrix, dice_metric, confusion_matrix_metrics
from .distance import hausdorff_surface_distance, hausdorff_pointwise_distance

__all__ = [
    "confusion_matrix",
    "dice_metric",
    "confusion_matrix_metrics",
    "hausdorff_surface_distance",
    "hausdorff_pointwise_distance",
]
