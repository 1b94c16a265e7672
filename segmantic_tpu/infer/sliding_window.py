"""Sliding-window inference with Gaussian-blended overlap accumulation.

Replaces MONAI's ``sliding_window_inference`` / ``SlidingWindowInferer``
(reference: src/segmantic/seg/monai_unet.py:352-356,637-639,840-842).
TPU-shaped: the window grid is computed once on the host (static window
count per volume shape), windows are gathered with ``lax.dynamic_slice``
inside one jitted step that runs ``sw_batch_size`` windows per forward, and
the logits·weight accumulation runs through a Pallas DMA kernel on TPU
(:mod:`segmantic_tpu.ops.pallas_blend`, ~5x the XLA fallback) with the
window grid quantized to the kernel's alignment contract; the XLA
read-modify-write path remains for CPU and unaligned configurations. The
whole volume and accumulators stay resident in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import pallas_blend


def window_starts(
    image_size: Sequence[int],
    roi_size: Sequence[int],
    overlap: float,
    align: Optional[Sequence[int]] = None,
) -> List[Tuple[int, ...]]:
    """Window origin grid (MONAI convention): stride = roi * (1 - overlap),
    last window snapped so it ends exactly at the image edge. With ``align``,
    strides/starts are quantized (caller pads so the snapped last start is
    aligned too)."""
    nd = len(image_size)
    per_axis: List[List[int]] = []
    for a in range(nd):
        size, roi = image_size[a], roi_size[a]
        q = align[a] if align else 1
        if roi >= size:
            per_axis.append([0])
            continue
        stride = max(int(roi * (1.0 - overlap)), 1)
        if q > 1:
            stride = max((stride // q) * q, q)
        starts = list(range(0, size - roi + 1, stride))
        if starts[-1] != size - roi:
            starts.append(size - roi)
        per_axis.append(starts)
    grids = np.meshgrid(*per_axis, indexing="ij")
    return [tuple(int(g.flat[i]) for g in grids) for i in range(grids[0].size)]


def gaussian_importance(roi_size: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian window-importance map (MONAI's blend weights)."""
    maps = []
    for s in roi_size:
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-3)
        x = np.arange(s, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = maps[0]
    for m in maps[1:]:
        w = np.multiply.outer(w, m)
    w = np.maximum(w, w.max() * 1e-3)  # avoid zero weights at corners
    return w.astype(np.float32)


@partial(jax.jit, static_argnames=("row",), donate_argnums=(0,))
def _update_rows(vol: jax.Array, slab: jax.Array, row: int) -> jax.Array:
    """Write ``slab`` into ``vol`` at axis-0 offset ``row`` (donated, so the
    update is in place — no copy of the whole volume per slab)."""
    return jax.lax.dynamic_update_slice(vol, slab, (row,) + (0,) * (vol.ndim - 1))


@partial(jax.jit, static_argnames=("roi", "nd"))
def _gather_windows(volume: jax.Array, starts: jax.Array, roi: Tuple[int, ...], nd: int):
    """volume (*spatial, C), starts (B, nd) → windows (B, *roi, C)."""

    def one(s):
        idx = tuple(s[a] for a in range(nd)) + (0,)
        return jax.lax.dynamic_slice(volume, idx, tuple(roi) + (volume.shape[-1],))

    return jax.vmap(one)(starts)


def _accumulate_impl(acc, weight_acc, logits, importance, starts, wmask=None):
    """Scatter-add logits*importance (and importance), optionally scaling
    each window's importance by ``wmask[i]`` (0 = padding window)."""
    nd = starts.shape[1]

    def body(i, carry):
        acc_, w_ = carry
        s = starts[i]
        idx = tuple(s[a] for a in range(nd)) + (0,)
        roi_c = logits.shape[1:]
        imp_i = importance if wmask is None else importance * wmask[i]
        cur = jax.lax.dynamic_slice(acc_, idx, roi_c)
        upd = cur + logits[i] * imp_i[..., None]
        acc_ = jax.lax.dynamic_update_slice(acc_, upd, idx)
        wcur = jax.lax.dynamic_slice(w_, idx[:-1] + (0,), roi_c[:-1] + (1,))
        w_ = jax.lax.dynamic_update_slice(
            w_, wcur + imp_i[..., None], idx[:-1] + (0,)
        )
        return acc_, w_

    return jax.lax.fori_loop(0, logits.shape[0], body, (acc, weight_acc))


@jax.jit
def _accumulate(acc, weight_acc, logits, importance, starts):
    """XLA fallback: scatter-add logits*importance (and importance)."""
    return _accumulate_impl(acc, weight_acc, logits, importance, starts)


def _accumulate_weight_impl(weight_acc, importance, starts, wmask=None):
    nd = starts.shape[1]

    def body(i, w_):
        s = starts[i]
        idx = tuple(s[a] for a in range(nd)) + (0,)
        roi_c = importance.shape + (1,)
        imp_i = importance if wmask is None else importance * wmask[i]
        wcur = jax.lax.dynamic_slice(w_, idx, roi_c)
        return jax.lax.dynamic_update_slice(w_, wcur + imp_i[..., None], idx)

    return jax.lax.fori_loop(0, starts.shape[0], body, weight_acc)


@jax.jit
def _accumulate_weight(weight_acc, importance, starts):
    """Weight-map-only accumulation (1/C of the traffic — stays on XLA)."""
    return _accumulate_weight_impl(weight_acc, importance, starts)


_SCAN_CACHE: "weakref.WeakKeyDictionary" = None  # lazy-initialized below


def _scanned_runner(predictor, roi, nd, pallas_on, c_pad, tile, n_classes):
    """One jitted scan over full window chunks: gather → forward → blend.

    Removes the per-chunk Python dispatch of the naive loop (large through
    a remote-TPU tunnel, still measurable locally) — the whole volume's
    full chunks become ONE device program. Cached per predictor (weak) and
    per static config, so repeated volumes reuse the compilation.
    """
    global _SCAN_CACHE
    import weakref

    if _SCAN_CACHE is None:
        _SCAN_CACHE = weakref.WeakKeyDictionary()
    per_pred = _SCAN_CACHE.setdefault(predictor, {})
    key = (tuple(roi), nd, pallas_on, c_pad, tile, n_classes)
    if key in per_pred:
        return per_pred[key]

    @partial(jax.jit, donate_argnums=(1, 2))
    def run(volume, acc, wacc, chunks, importance):
        def body(carry, chunk_starts):
            acc_, wacc_ = carry
            windows = _gather_windows(volume, chunk_starts, tuple(roi), nd)
            logits = predictor(windows)
            if pallas_on:
                if logits.shape[-1] < c_pad:
                    logits = jnp.pad(
                        logits,
                        [(0, 0)] * (logits.ndim - 1)
                        + [(0, c_pad - logits.shape[-1])],
                    )
                acc_ = pallas_blend.accumulate_windows_pallas(
                    acc_, logits, importance, chunk_starts, tile=tile
                )
                wacc_ = _accumulate_weight(wacc_, importance, chunk_starts)
            else:
                acc_, wacc_ = _accumulate(
                    acc_, wacc_, logits, importance, chunk_starts
                )
            return (acc_, wacc_), None

        (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), chunks)
        return acc, wacc

    per_pred[key] = run
    return run


def _pallas_enabled(use_pallas, nd: int, roi, n_classes: int) -> Tuple[bool, int]:
    if use_pallas is False:
        return False, n_classes
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas == "auto" and not on_tpu:
        return False, n_classes
    if nd != 3:
        return False, n_classes
    c_pad = pallas_blend.padded_channels(n_classes)
    if not pallas_blend.supports_roi(tuple(roi), c_pad):
        return False, n_classes
    return True, c_pad


def sliding_window_inference(
    volume,  # (*spatial, C) array (np or jnp)
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable,  # (B, *roi, C) -> (B, *roi, num_classes)
    overlap: float = 0.25,
    mode: str = "gaussian",
    num_classes: Optional[int] = None,
    use_pallas="auto",
    mesh=None,
    scan_chunks: bool = True,
    shard_volume: bool = False,
    upload_pipeline="auto",
    wire_dtype=None,
) -> jax.Array:
    """Run tiled inference over an arbitrarily-sized volume.

    Returns (*spatial, num_classes) blended logits. The volume is zero-padded
    up to the roi when smaller (result cropped back).

    ``upload_pipeline`` (host numpy input, no mesh): instead of one blocking
    whole-volume transfer, axis-0 slabs are enqueued ahead of the window
    chunks that need them, so the host→device wire overlaps device compute
    (the window grid is axis-0-major, so chunk k only reads rows up to its
    last start + roi). "auto" = on when the default backend is TPU (where
    the link — PCIe or a tunnel — is the bottleneck the r2 VERDICT measured:
    51.8 vs 212.8 vols/min). ``wire_dtype`` (e.g. ``jnp.bfloat16``) casts the
    host volume before upload — half the wire bytes; the bf16 model consumes
    bf16 windows anyway, so only the input quantization changes
    (characterized in tests/infer/test_upload_pipeline.py).
    ``jnp.float8_e4m3fn`` quarters the wire and is LOSSY: measured envelope
    on a trained model (tests/infer/test_fp8_wire.py) is 99.93% argmax
    agreement and per-class Dice >= 0.998 vs the f32 wire — safe for bf16
    models on z-scored inputs, not for calibration-sensitive consumers.

    With ``mesh``, window batches are sharded over the mesh's 'data' axis so
    the model forward fans out across chips (the spatial analog of context
    parallelism — SURVEY.md §2.9); windows are independent, so results are
    identical to single-device execution. With ``shard_volume=True`` the
    VOLUME (and accumulators) shard over 'data' instead — per-chip memory
    is one slab + halo, scaling capacity with chips
    (:func:`sliding_window_inference_sharded`).
    """
    if mesh is not None and shard_volume:
        n_data = int(mesh.shape["data"])
        spatial0 = volume.shape[0] + max(roi_size[0] - volume.shape[0], 0)
        if n_data > 1 and -(-spatial0 // n_data) >= roi_size[0]:
            return sliding_window_inference_sharded(
                volume, roi_size, sw_batch_size, predictor, mesh,
                overlap=overlap, mode=mode, num_classes=num_classes,
            )
        # slabs thinner than the roi: fall through to window sharding
    # huge volumes (accumulators would not fit HBM): stream from host DRAM
    n_cls_est = num_classes if num_classes else 8
    est_bytes = int(np.prod(volume.shape[: len(roi_size)])) * 4 * (n_cls_est + 2)
    if mesh is None and isinstance(volume, np.ndarray) and est_bytes > 8 << 30:
        return sliding_window_inference_streamed(
            volume, roi_size, sw_batch_size, predictor,
            overlap=overlap, mode=mode, num_classes=num_classes,
        )

    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        n_data = mesh.shape["data"]
        if sw_batch_size % n_data != 0:
            sw_batch_size = max(n_data, (sw_batch_size // n_data) * n_data)
        window_sharding = batch_sharding(mesh, len(roi_size) + 2)
    else:
        window_sharding = None
    nd = len(roi_size)
    host_np = isinstance(volume, np.ndarray)
    pipeline_on = bool(upload_pipeline) and host_np and mesh is None
    if upload_pipeline == "auto":
        pipeline_on = pipeline_on and jax.default_backend() == "tpu"
    if host_np and wire_dtype is not None:
        volume = volume.astype(wire_dtype)
    if not pipeline_on:
        volume = jnp.asarray(volume)
    spatial = volume.shape[:nd]

    # probe classes with one minimal window if not given
    if num_classes is None:
        if pipeline_on:
            win = volume[
                tuple(slice(0, min(roi_size[a], spatial[a])) for a in range(nd))
            ]
            win = np.pad(
                win,
                [(0, roi_size[a] - win.shape[a]) for a in range(nd)] + [(0, 0)],
            )
            probe = predictor(jnp.asarray(win)[None])
        else:
            probe_vol = volume
            pad0 = [max(roi_size[a] - spatial[a], 0) for a in range(nd)]
            if any(pad0):
                probe_vol = jnp.pad(
                    volume, [(0, p) for p in pad0] + [(0, 0)]
                )
            probe = predictor(
                _gather_windows(
                    probe_vol, jnp.zeros((1, nd), jnp.int32), tuple(roi_size), nd
                )
            )
        n_classes = probe.shape[-1]
    else:
        n_classes = num_classes

    pallas_on, c_pad = _pallas_enabled(use_pallas, nd, roi_size, n_classes)

    # padding: up to roi everywhere; plus alignment padding for the pallas grid
    pad = [max(roi_size[a] - spatial[a], 0) for a in range(nd)]
    lo = [p // 2 for p in pad]
    if pallas_on:
        q1, q2 = pallas_blend.alignment_quanta(c_pad)
        align = (1, q1, q2)
        # pad high side so padded size is a multiple of the quantum (then
        # size - roi is too, since roi is quantum-aligned per supports_roi)
        for a, q in enumerate(align):
            if q > 1:
                total = spatial[a] + pad[a]
                extra = (-total) % q
                pad[a] += extra
    else:
        align = None

    if any(pad):
        widths = [(lo[a], pad[a] - lo[a]) for a in range(nd)] + [(0, 0)]
        volume = (np.pad if pipeline_on else jnp.pad)(volume, widths)
    padded = volume.shape[:nd]

    starts = window_starts(padded, roi_size, overlap, align=align)
    if mode == "gaussian":
        importance = jnp.asarray(gaussian_importance(roi_size))
    else:
        importance = jnp.ones(tuple(roi_size), jnp.float32)

    acc_classes = c_pad if pallas_on else n_classes
    acc = jnp.zeros(tuple(padded) + (acc_classes,), jnp.float32)
    wacc = jnp.zeros(tuple(padded) + (1,), jnp.float32)
    tile = (
        pallas_blend.pick_tile(*tuple(roi_size), acc_classes) if pallas_on else None
    )

    def flush(acc, wacc, logits, chunk):
        starts_d = jnp.asarray(chunk)
        if pallas_on:
            if logits.shape[-1] < c_pad:
                logits = jnp.pad(
                    logits, [(0, 0)] * (logits.ndim - 1) + [(0, c_pad - logits.shape[-1])]
                )
            acc = pallas_blend.accumulate_windows_pallas(
                acc, logits, importance, starts_d, tile=tile
            )
            wacc = _accumulate_weight(wacc, importance, starts_d)
            return acc, wacc
        return _accumulate(acc, wacc, logits, importance, starts_d)

    all_starts = np.asarray(starts, np.int32)
    n = len(starts)

    # full chunks run inside one jitted scan (no per-chunk host dispatch);
    # the short tail chunk (if any) falls through to the Python loop below.
    start_i = 0
    n_full = n // sw_batch_size
    slabs: List = []
    bounds: List = []
    if pipeline_on:
        # pipelined upload: enqueue EVERY slab transfer now (async), then
        # integrate each slab right before the first chunk that reads it —
        # the wire for slab k+1 overlaps chunk k's device compute (the
        # window grid is axis-0-major, so per-chunk row needs are monotone)
        roi0 = roi_size[0]
        host_vol = volume
        rows = 0
        for i in range(0, n, sw_batch_size):
            need = min(
                int(all_starts[i : i + sw_batch_size, 0].max()) + roi0, padded[0]
            )
            bounds.append((rows, need) if need > rows else None)
            rows = max(rows, need)
        slabs = [jnp.asarray(host_vol[b[0] : b[1]]) if b else None for b in bounds]
        volume = jnp.zeros(tuple(padded) + (host_vol.shape[-1],), host_vol.dtype)
    elif scan_chunks and mesh is None and n_full >= 1:
        chunks = jnp.asarray(
            all_starts[: n_full * sw_batch_size].reshape(n_full, sw_batch_size, nd)
        )
        run = _scanned_runner(
            predictor, tuple(roi_size), nd, pallas_on, c_pad, tile, n_classes
        )
        acc, wacc = run(volume, acc, wacc, chunks, importance)
        start_i = n_full * sw_batch_size

    for ci, i in enumerate(range(start_i, n, sw_batch_size)):
        if pipeline_on and slabs[ci] is not None:
            volume = _update_rows(volume, slabs[ci], bounds[ci][0])
        chunk = all_starts[i : i + sw_batch_size]
        short = len(chunk) < sw_batch_size
        if short:  # pad to static batch, drop duplicate results before blending
            reps = sw_batch_size - len(chunk)
            padded_chunk = np.concatenate([chunk, np.repeat(chunk[-1:], reps, axis=0)])
            windows = _gather_windows(
                volume, jnp.asarray(padded_chunk), tuple(roi_size), nd
            )
            if window_sharding is not None:
                windows = jax.device_put(windows, window_sharding)
            logits = predictor(windows)[: len(chunk)]
        else:
            windows = _gather_windows(volume, jnp.asarray(chunk), tuple(roi_size), nd)
            if window_sharding is not None:
                windows = jax.device_put(windows, window_sharding)
            logits = predictor(windows)
        acc, wacc = flush(acc, wacc, logits, chunk)

    out = acc[..., :n_classes] / wacc
    sl = tuple(slice(lo[a], lo[a] + spatial[a]) for a in range(nd)) + (slice(None),)
    return out[sl]


def sliding_window_inference_streamed(
    volume: np.ndarray,  # (*spatial, C) HOST array
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable,
    overlap: float = 0.25,
    mode: str = "gaussian",
    num_classes: Optional[int] = None,
) -> np.ndarray:
    """Sliding-window inference for volumes too large for HBM.

    The volume and both accumulators stay in HOST memory; only each window
    batch travels to the device (and its logits back). Device memory use is
    O(sw_batch * roi) regardless of volume size — the large-volume strategy
    SURVEY.md §7 calls for ("host-DRAM cache streaming"). Same grid and
    Gaussian blend as :func:`sliding_window_inference` (MONAI semantics).
    """
    volume = np.asarray(volume)
    nd = len(roi_size)
    spatial = volume.shape[:nd]

    pad = [max(roi_size[a] - spatial[a], 0) for a in range(nd)]
    lo = [p // 2 for p in pad]
    if any(pad):
        widths = [(lo[a], pad[a] - lo[a]) for a in range(nd)] + [(0, 0)]
        volume = np.pad(volume, widths)
    padded = volume.shape[:nd]

    starts = window_starts(padded, roi_size, overlap)
    if mode == "gaussian":
        importance = gaussian_importance(roi_size)
    else:
        importance = np.ones(tuple(roi_size), np.float32)

    if num_classes is None:
        probe = predictor(
            jnp.asarray(
                volume[tuple(slice(0, r) for r in roi_size)][None]
            )
        )
        num_classes = int(np.asarray(probe).shape[-1])

    acc = np.zeros(tuple(padded) + (num_classes,), np.float32)
    wacc = np.zeros(tuple(padded) + (1,), np.float32)
    imp = importance[..., None]

    def crop(chunk):
        return np.stack(
            [
                volume[tuple(slice(s[a], s[a] + roi_size[a]) for a in range(nd))]
                for s in chunk
            ]
        )

    # one-deep software pipeline: jax dispatch is async, so launching the
    # device forward for chunk k and only then cropping + uploading chunk
    # k+1 (and blending k's logits on host after) overlaps host work and
    # transfers with device compute — np.asarray is the only sync point
    n = len(starts)
    chunks = [starts[i : i + sw_batch_size] for i in range(0, n, sw_batch_size)]
    pending = None  # (chunk, device logits future)
    for chunk in chunks + [None]:
        launched = None
        if chunk is not None:
            launched = (chunk, predictor(jnp.asarray(crop(chunk))))
        if pending is not None:
            done_chunk, fut = pending
            logits = np.asarray(fut, np.float32)
            for j, s in enumerate(done_chunk):
                sl = tuple(slice(s[a], s[a] + roi_size[a]) for a in range(nd))
                acc[sl] += logits[j] * imp
                wacc[sl] += imp
        pending = launched

    out = acc / wacc
    sl = tuple(slice(lo[a], lo[a] + spatial[a]) for a in range(nd)) + (slice(None),)
    return out[sl]


def _accumulate_masked(acc, weight_acc, logits, importance, starts, wmask):
    """:func:`_accumulate` with a per-window weight mask (0 = padding)."""
    return _accumulate_impl(acc, weight_acc, logits, importance, starts, wmask)


def sliding_window_inference_sharded(
    volume,  # (*spatial, C) host array
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable,
    mesh,
    overlap: float = 0.25,
    mode: str = "gaussian",
    num_classes: Optional[int] = None,
    use_pallas="auto",
) -> jax.Array:
    """Whole-volume inference with the VOLUME sharded over the mesh's
    'data' axis (spatial axis 0) — the multi-chip large-volume strategy:
    per-chip HBM holds only its slab (+ a window-sized halo) and its slab's
    accumulators, so volume capacity scales with the number of chips
    (SURVEY.md §2.9/§5.7; the reference's only scaling is a Lightning GPU
    list, src/segmantic/seg/monai_unet.py:529-538).

    Windows are owned by the device their start row falls in; the one-hop
    halo (next slab's first ``roi`` rows) arrives by ``ppermute`` over ICI,
    each device blends its own windows locally (Pallas blend kernel on
    aligned TPU configurations; same grid and Gaussian weights as the
    single-device path — results identical up to fp summation order), and
    the accumulated window tails that spill into the next slab return by a
    second ``ppermute``. Requires slab >= roi along axis 0 (falls back to
    the window-sharded path otherwise). The host volume is device_put
    directly onto the sharding — no single chip ever holds the whole
    volume — and the compiled runner is cached per (predictor, config).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = int(mesh.shape["data"])
    nd = len(roi_size)
    volume = np.asarray(volume)
    spatial = volume.shape[:nd]
    roi0 = roi_size[0]

    if num_classes is None:
        probe = predictor(
            jnp.asarray(
                np.pad(
                    volume[tuple(slice(0, r) for r in roi_size)],
                    [(0, max(roi_size[a] - spatial[a], 0)) for a in range(nd)]
                    + [(0, 0)],
                )[None]
            )
        )
        num_classes = int(np.asarray(probe).shape[-1])

    pallas_on, c_pad = _pallas_enabled(use_pallas, nd, roi_size, num_classes)

    pad = [max(roi_size[a] - spatial[a], 0) for a in range(nd)]
    lo = [p // 2 for p in pad]
    if pallas_on:
        # the blend kernel constrains starts on the sublane/lane axes
        # (1, 2) only — axis-0 slab offsets are unconstrained, so the
        # single-device alignment recipe carries over unchanged
        q1, q2 = pallas_blend.alignment_quanta(c_pad)
        align = (1, q1, q2)
        for a, q in enumerate(align):
            if q > 1:
                pad[a] += (-(spatial[a] + pad[a])) % q
    else:
        align = None

    d_roi = spatial[0] + pad[0]
    # the window grid comes from the roi/alignment-padded size — identical
    # to the single-device grid; the slab padding below only adds dead rows
    grid_size = tuple(spatial[a] + pad[a] for a in range(nd))
    slab = max(-(-d_roi // n), roi0)
    pad[0] += slab * n - d_roi
    if any(pad):
        widths = [(lo[a], pad[a] - lo[a]) for a in range(nd)] + [(0, 0)]
        volume = np.pad(volume, widths)
    padded = volume.shape[:nd]

    starts = window_starts(grid_size, roi_size, overlap, align=align)
    if mode == "gaussian":
        importance = jnp.asarray(gaussian_importance(roi_size))
    else:
        importance = jnp.ones(tuple(roi_size), jnp.float32)

    # group windows by owning slab; localize axis-0 starts
    per_dev: List[List[Tuple[int, ...]]] = [[] for _ in range(n)]
    for s in starts:
        d = min(s[0] // slab, n - 1)
        per_dev[d].append((s[0] - d * slab,) + tuple(s[1:]))
    m = max(len(g) for g in per_dev)
    m_pad = -(-m // sw_batch_size) * sw_batch_size
    starts_arr = np.zeros((n, m_pad, nd), np.int32)
    mask_arr = np.zeros((n, m_pad), np.float32)
    for d, g in enumerate(per_dev):
        if g:
            starts_arr[d, : len(g)] = np.asarray(g, np.int32)
            mask_arr[d, : len(g)] = 1.0
    k = m_pad // sw_batch_size
    chunks = starts_arr.reshape(n, k, sw_batch_size, nd)
    masks = mask_arr.reshape(n, k, sw_batch_size)

    # shard host->device directly: no single chip holds the whole volume
    vol_sharded = jax.device_put(
        volume, NamedSharding(mesh, P("data", *([None] * nd)))
    )

    run = _sharded_runner(
        predictor, mesh, tuple(roi_size), nd, n, slab, tuple(padded),
        num_classes, pallas_on, c_pad,
    )
    acc, wacc = run(
        vol_sharded, jnp.asarray(chunks), jnp.asarray(masks), importance
    )
    out = acc[..., :num_classes] / wacc
    sl = tuple(slice(lo[a], lo[a] + spatial[a]) for a in range(nd)) + (slice(None),)
    return out[sl]


_SHARDED_CACHE = None  # WeakKeyDictionary, lazy like _SCAN_CACHE


def _sharded_runner(predictor, mesh, roi, nd, n, slab, padded, n_classes,
                    pallas_on, c_pad):
    """Build (or fetch) the jitted shard_map runner for one static config.

    Cached per predictor (weak) and per static config so repeated volumes
    of the same shape reuse the compilation — the sharded analog of
    :func:`_scanned_runner`."""
    global _SHARDED_CACHE
    import weakref

    if _SHARDED_CACHE is None:
        _SHARDED_CACHE = weakref.WeakKeyDictionary()
    per_pred = _SHARDED_CACHE.setdefault(predictor, {})
    key = (id(mesh), roi, nd, n, slab, padded, n_classes, pallas_on, c_pad)
    if key in per_pred:
        return per_pred[key]

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    roi0 = roi[0]
    acc_classes = c_pad if pallas_on else n_classes
    tile = pallas_blend.pick_tile(*roi, acc_classes) if pallas_on else None
    fwd_perm = [(d, d + 1) for d in range(n - 1)]  # tails to the next slab
    bwd_perm = [(d + 1, d) for d in range(n - 1)]  # halos from the next slab

    def run_body(vol_l, chunks_l, masks_l, importance):
        chunks_l, masks_l = chunks_l[0], masks_l[0]
        halo = jax.lax.ppermute(vol_l[:roi0], "data", bwd_perm)
        ext = jnp.concatenate([vol_l, halo], axis=0)

        acc = jnp.zeros((slab + roi0,) + tuple(padded[1:]) + (acc_classes,),
                        jnp.float32)
        wacc = jnp.zeros((slab + roi0,) + tuple(padded[1:]) + (1,), jnp.float32)

        def body(carry, xs):
            chunk, msk = xs
            windows = _gather_windows(ext, chunk, roi, nd)
            logits = predictor(windows)
            acc_, wacc_ = carry
            if pallas_on:
                # masked windows contribute zero through zeroed logits; the
                # weight map gets the mask directly
                logits = logits * msk[(...,) + (None,) * (logits.ndim - 1)]
                if logits.shape[-1] < c_pad:
                    logits = jnp.pad(
                        logits,
                        [(0, 0)] * (logits.ndim - 1)
                        + [(0, c_pad - logits.shape[-1])],
                    )
                acc_ = pallas_blend.accumulate_windows_pallas(
                    acc_, logits, importance, chunk, tile=tile
                )
                wacc_ = _accumulate_weight_impl(wacc_, importance, chunk, msk)
            else:
                acc_, wacc_ = _accumulate_masked(
                    acc_, wacc_, logits, importance, chunk, msk
                )
            return (acc_, wacc_), None

        (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), (chunks_l, masks_l))

        tail_a = jax.lax.ppermute(acc[slab:], "data", fwd_perm)
        tail_w = jax.lax.ppermute(wacc[slab:], "data", fwd_perm)
        acc = acc[:slab].at[:roi0].add(tail_a)
        wacc = wacc[:slab].at[:roi0].add(tail_w)
        return acc, wacc

    specs = dict(
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P("data")),
    )
    try:  # jax >= 0.8 names the replication check check_vma
        run = shard_map(run_body, check_vma=False, **specs)
    except TypeError:
        run = shard_map(run_body, check_rep=False, **specs)
    run = jax.jit(run)
    per_pred[key] = run
    return run


class SlidingWindowInferer:
    """Callable wrapper with fixed roi/sw_batch/overlap (MONAI-style API)."""

    def __init__(
        self,
        roi_size: Sequence[int],
        sw_batch_size: int = 4,
        overlap: float = 0.25,
        mode: str = "gaussian",
        use_pallas="auto",
        mesh=None,
        shard_volume: bool = False,
        upload_pipeline="auto",
        wire_dtype=None,
    ):
        self.roi_size = list(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode
        self.use_pallas = use_pallas
        self.mesh = mesh
        self.shard_volume = shard_volume
        self.upload_pipeline = upload_pipeline
        self.wire_dtype = wire_dtype

    def __call__(self, volume, predictor: Callable):
        return sliding_window_inference(
            volume,
            self.roi_size,
            self.sw_batch_size,
            predictor,
            overlap=self.overlap,
            mode=self.mode,
            use_pallas=self.use_pallas,
            mesh=self.mesh,
            shard_volume=self.shard_volume,
            upload_pipeline=self.upload_pipeline,
            wire_dtype=self.wire_dtype,
        )
