"""Host volume cache + class-balanced patch batch sampler.

Replaces MONAI's CacheDataset + DataLoader
(reference: src/segmantic/seg/monai_unet.py:264-290): the deterministic
preprocessing prefix runs ONCE per volume into host RAM, along with a
precomputed per-class voxel index so class-balanced crop centers are O(1)
to sample (SURVEY.md §7 "hard parts" — dynamic-shape-hostile on device,
so indices live on the host). Each training step then:

1. samples `num_samples` patch centers per chosen volume by class ratio,
2. memcpy-crops margin patches (pure numpy slicing + zero pad),
3. stacks a channel-last batch for `device_put` — rotation/zoom/intensity
   run fused on device (`segmantic_tpu.train.augment`).

A double-buffered background thread keeps a batch ready while the TPU step
runs (host→HBM transfer overlaps compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..core.volume import Volume
from ..transforms.base import Compose, Sample


class CachedVolume:
    """One preprocessed volume in host RAM with its class-location index."""

    def __init__(self, sample: Sample, num_classes: int):
        self.image: Volume = sample["image"]
        self.label: Optional[Volume] = sample.get("label")
        self.num_classes = num_classes
        self.class_indices: Optional[List[np.ndarray]] = None
        if self.label is not None:
            flat = self.label.numpy().reshape(-1)
            order = np.argsort(flat, kind="stable")
            sorted_vals = flat[order]
            bounds = np.searchsorted(sorted_vals, np.arange(num_classes + 1))
            self.class_indices = [
                order[bounds[c] : bounds[c + 1]] for c in range(num_classes)
            ]

    @property
    def spatial_shape(self) -> Tuple[int, ...]:
        return self.image.spatial_shape


class VolumeCache:
    """Apply the deterministic prefix once per file pair; keep results in RAM.

    ``cache_rate`` < 1 keeps only a fraction cached (rest recomputed lazily),
    mirroring the reference's CacheDataset knob.
    """

    def __init__(
        self,
        files: Sequence[Dict],
        preprocessing: Compose,
        num_classes: int,
        cache_rate: float = 1.0,
        num_workers: Optional[int] = None,
    ):
        self.files = list(files)
        self.preprocessing = preprocessing
        self.num_classes = num_classes
        n_cache = int(len(self.files) * cache_rate)
        self._cache: Dict[int, CachedVolume] = {}
        if n_cache:
            import concurrent.futures as cf
            import os

            workers = num_workers or min(os.cpu_count() or 1, n_cache, 8)
            if workers > 1:
                # numpy/zlib release the GIL — threads parallelize the
                # decode+preprocess cache build across volumes
                with cf.ThreadPoolExecutor(workers) as pool:
                    for i, vol in enumerate(pool.map(self._load, range(n_cache))):
                        self._cache[i] = vol
            else:
                for i in range(n_cache):
                    self._cache[i] = self._load(i)

    def _load(self, i: int) -> CachedVolume:
        sample = dict(self.files[i])
        out = self.preprocessing(sample)
        return CachedVolume(out, self.num_classes)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> CachedVolume:
        if i in self._cache:
            return self._cache[i]
        return self._load(i)


def _crop_with_pad(
    data: np.ndarray, start: Sequence[int], size: Sequence[int]
) -> np.ndarray:
    """Crop (C, *spatial) with zero padding where the window leaves bounds."""
    nd = data.ndim - 1
    out = np.zeros(data.shape[:1] + tuple(size), dtype=data.dtype)
    src_sl, dst_sl = [slice(None)], [slice(None)]
    for a in range(nd):
        s0 = start[a]
        s1 = s0 + size[a]
        c0, c1 = max(s0, 0), min(s1, data.shape[1 + a])
        if c0 >= c1:
            return out
        src_sl.append(slice(c0, c1))
        dst_sl.append(slice(c0 - s0, c1 - s0))
    out[tuple(dst_sl)] = data[tuple(src_sl)]
    return out


class PatchSampler:
    """Class-balanced margin-patch batches from a VolumeCache.

    Emits channel-last numpy batches: image (B, *margin, C) float32 and
    label (B, *margin) int32, where margin = patch_size + 2*margin_voxels
    (margin feeds the fused on-device rotation/zoom so patch borders come
    from real data, like the reference's rotate-then-crop order).
    """

    def __init__(
        self,
        cache: VolumeCache,
        patch_size: Sequence[int],
        batch_size: int,
        num_samples: int = 4,
        ratios: Optional[Sequence[float]] = None,
        margin: int = 0,
        seed: int = 0,
        image_wire_dtype=np.float32,
    ):
        self.cache = cache
        self.image_wire_dtype = image_wire_dtype
        self.patch_size = list(patch_size)
        self.margin = margin
        self.margin_size = [p + 2 * margin for p in self.patch_size]
        self.batch_size = batch_size
        self.num_samples = num_samples
        self.num_classes = cache.num_classes
        self.ratios = (
            list(ratios)
            if ratios is not None
            else [0 if c == 0 else 1 for c in range(cache.num_classes)]
        )
        self.rng = np.random.default_rng(seed)

    def _sample_center(self, vol: CachedVolume) -> List[int]:
        ratios = np.asarray(self.ratios, np.float64)
        avail = np.array([len(ci) > 0 for ci in vol.class_indices])
        w = np.where(avail, ratios, 0.0)
        if w.sum() == 0:
            w = avail.astype(np.float64)
        w = w / w.sum()
        cls = self.rng.choice(self.num_classes, p=w)
        pick = vol.class_indices[cls][self.rng.integers(len(vol.class_indices[cls]))]
        return list(np.unravel_index(pick, vol.spatial_shape))

    def sample_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        nd = len(self.patch_size)
        picks: List[Tuple[CachedVolume, List[int]]] = []
        while len(picks) < self.batch_size:
            vol = self.cache[self.rng.integers(len(self.cache))]
            take = min(self.num_samples, self.batch_size - len(picks))
            for _ in range(take):
                center = self._sample_center(vol)
                start = []
                for a in range(nd):
                    p, s = self.patch_size[a], vol.spatial_shape[a]
                    if s < p:
                        # volume smaller than the patch: center it (the
                        # symmetric SpatialPadd the reference applies)
                        st = -((p - s) // 2)
                    else:
                        # clamp the PATCH window inside the volume like
                        # MONAI's correct_crop_centers — edge-centered
                        # crops must carry real voxels, not zero padding
                        # (unclamped starts measurably slowed convergence
                        # ~2x on the exp/headtohead_torch.py protocol);
                        # only the aug margin may hang outside
                        st = min(max(center[a] - p // 2, 0), s - p)
                    start.append(st - self.margin)
                picks.append((vol, start))

        # multithreaded C++ crop+pack when eligible (identical output)
        if nd == 3 and self.num_classes <= 256 and self._native_ok(picks):
            return self._sample_batch_native(picks)

        images, labels = [], []
        for vol, start in picks:
            images.append(
                _crop_with_pad(vol.image.numpy(), start, self.margin_size)
            )
            labels.append(
                _crop_with_pad(vol.label.numpy(), start, self.margin_size)[0]
            )
        # image_wire_dtype=bfloat16 halves H2D transfer when the train step
        # computes in bf16 anyway (the step re-upcasts for augmentation)
        image_b = np.stack(images).astype(self.image_wire_dtype)  # (B, C, *margin)
        image_b = np.moveaxis(image_b, 1, -1)  # channel-last
        # compact wire dtype: labels travel host->device every step, and
        # uint8 is lossless for <=256 classes (the train step casts to int32
        # on device); 4x less transfer than int32
        label_dtype = np.uint8 if self.num_classes <= 256 else np.int32
        label_b = np.stack(labels).astype(label_dtype)
        return image_b, label_b

    @staticmethod
    def _native_ok(picks) -> bool:
        from .. import native

        if not native.available():
            return False
        return all(
            v.image.numpy().dtype == np.float32
            and v.label is not None
            and np.issubdtype(v.label.numpy().dtype, np.integer)
            for v, _ in picks
        )

    def _sample_batch_native(self, picks) -> Tuple[np.ndarray, np.ndarray]:
        """Fused C++ pad+crop+transpose+cast, multithreaded over the batch
        (the CacheDataset hot-loop analogue); output identical to the numpy
        path — per-volume runs preserve batch order. The full batch is
        allocated once and per-volume runs write into their slice (no
        np.concatenate recopy); uint8 cached labels pass to C++ as-is."""
        import ml_dtypes
        from .. import native

        to_bf16 = np.dtype(self.image_wire_dtype).itemsize == 2
        img_dtype = ml_dtypes.bfloat16 if to_bf16 else np.float32
        b = len(picks)
        c = picks[0][0].image.numpy().shape[0]
        out_sz = tuple(self.margin_size)
        img_out = np.empty((b,) + out_sz + (c,), img_dtype)
        lbl_out = np.empty((b,) + out_sz, np.uint8)
        i = 0
        while i < len(picks):
            vol = picks[i][0]
            j = i
            starts = []
            while j < len(picks) and picks[j][0] is vol:
                starts.append(picks[j][1])
                j += 1
            native.crop_patches_3d(
                vol.image.numpy(),
                vol.label.numpy()[0],
                np.asarray(starts, np.int64),
                self.margin_size,
                to_bf16=to_bf16,
                out=(img_out[i:j], lbl_out[i:j]),
            )
            i = j
        return img_out, lbl_out

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.sample_batch()


class PrefetchLoader:
    """Background-thread batch prefetcher (double-buffered)."""

    def __init__(self, sampler: PatchSampler, prefetch: int = 2):
        self.sampler = sampler
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        while not self._stop.is_set():
            batch = self.sampler.sample_batch()
            while not self._stop.is_set():
                try:
                    self.queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.queue.get()

    def stop(self) -> None:
        self._stop.set()
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
