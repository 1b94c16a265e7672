from .sliding_window import SlidingWindowInferer, sliding_window_inference

__all__ = ["SlidingWindowInferer", "sliding_window_inference"]
