"""Transform pipeline core: dict-samples, Compose, deterministic/random split.

The pipeline operates on dict samples ``{"image": Volume, "label": Volume}``
like MONAI dict-transforms, but randomness is explicit: every random
transform draws from a ``numpy.random.Generator`` threaded by
:class:`Compose` (reference relies on MONAI's global ``set_determinism``;
reference: src/segmantic/seg/monai_unet.py:229).

``Compose.split_deterministic()`` exposes the boundary between the
deterministic prefix (run once per volume, host-cached — the CacheDataset
boundary, reference: src/segmantic/seg/monai_unet.py:264-276) and the random
suffix (run per step, on device where possible).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence, Union

import numpy as np

Sample = Dict[str, Any]


class MapTransform:
    """Deterministic dict-transform over selected keys."""

    def __init__(self, keys: Union[str, Sequence[str]]):
        self.keys: List[str] = [keys] if isinstance(keys, str) else list(keys)

    def __call__(self, sample: Sample) -> Union[Sample, List[Sample]]:
        raise NotImplementedError

    def present_keys(self, sample: Sample) -> List[str]:
        return [k for k in self.keys if k in sample]


class RandMapTransform(MapTransform):
    """Random dict-transform; called with an explicit RNG."""

    is_random = True

    def __init__(self, keys: Union[str, Sequence[str]], prob: float = 1.0):
        super().__init__(keys)
        self.prob = float(prob)

    def __call__(  # type: ignore[override]
        self, sample: Sample, rng: np.random.Generator
    ) -> Union[Sample, List[Sample]]:
        raise NotImplementedError

    def should_apply(self, rng: np.random.Generator) -> bool:
        return bool(rng.random() < self.prob)


def _is_random(t: Any) -> bool:
    return getattr(t, "is_random", False)


class Compose:
    """Sequential pipeline; transforms returning a list fan out (one volume →
    N patches, like MONAI's RandCropByLabelClasses)."""

    def __init__(self, transforms: Iterable[Any], rng: Optional[np.random.Generator] = None):
        self.transforms = [t for t in transforms if t is not None]
        self.rng = rng if rng is not None else np.random.default_rng(0)

    def __call__(
        self, sample: Sample, rng: Optional[np.random.Generator] = None
    ) -> Union[Sample, List[Sample]]:
        rng = rng if rng is not None else self.rng
        items: List[Sample] = [sample]
        fanned_out = False
        for t in self.transforms:
            next_items: List[Sample] = []
            for item in items:
                out = t(item, rng) if _is_random(t) else t(item)
                if isinstance(out, list):
                    next_items.extend(out)
                    fanned_out = True
                else:
                    next_items.append(out)
            items = next_items
        return items if fanned_out else items[0]

    def split_deterministic(self) -> "tuple[Compose, Compose]":
        """Split at the first random transform → (cacheable prefix, random suffix)."""
        idx = len(self.transforms)
        for i, t in enumerate(self.transforms):
            if _is_random(t):
                idx = i
                break
        return (
            Compose(self.transforms[:idx], rng=self.rng),
            Compose(self.transforms[idx:], rng=self.rng),
        )

    def flatten(self) -> "Compose":
        flat: List[Any] = []
        for t in self.transforms:
            if isinstance(t, Compose):
                flat.extend(t.flatten().transforms)
            else:
                flat.append(t)
        return Compose(flat, rng=self.rng)
