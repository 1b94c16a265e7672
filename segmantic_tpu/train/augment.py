"""Fused on-device batched augmentation (the training hot path).

TPU-native redesign of the reference's per-volume host augmentation chain
(reference: src/segmantic/seg/monai_unet.py:178-219): instead of rotating /
zooming whole volumes on the host and then cropping, the patch sampler
crops margin patches and this module applies — inside one jit, vmapped over
the batch — shear-decomposed rotation+zoom (row gathers; see
ops/shear_resample.py) followed by a center crop, plus flips and the
intensity zoo (gamma contrast, histogram shift, polynomial bias field, and
Gibbs ringing / k-space spikes on exact-count random batch subsets).
Each sample draws independent params from a ``jax.random`` key, so
augmentation is deterministic given the step key.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.shear_resample import (
    center_crop,
    rotate_zoom_nn_gather,
    rotate_zoom_shear,
    rotation_matrix,
)
from ..transforms import intensity_ops as iops


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Static augmentation configuration (hashable → one jit compile)."""

    spatial: bool = False
    intensity: bool = False
    flip_prob: float = 0.2
    rotate_prob: float = 0.2
    rotate_range: float = 0.4
    zoom_prob: float = 0.2
    zoom_range: Tuple[float, float] = (0.8, 1.3)
    contrast_prob: float = 0.2
    contrast_gamma: Tuple[float, float] = (0.5, 4.5)
    hist_shift_prob: float = 0.2
    hist_control_points: int = 10
    bias_prob: float = 0.2
    bias_degree: int = 3
    bias_coeff_range: Tuple[float, float] = (0.0, 0.1)
    gibbs_prob: float = 0.2
    gibbs_alpha: Tuple[float, float] = (0.0, 1.0)
    spike_prob: float = 0.2
    spike_intensity: Tuple[float, float] = (0.95, 1.10)
    # run the image interp matmuls in bf16 (single MXU pass). The trainer
    # couples this to mixed_precision: when the step computes in bf16, the
    # ~0.4% interp-weight noise is below the cast that follows anyway.
    # Labels are unaffected (their one-hot path is bf16-exact regardless).
    interp_bf16: bool = True
    # resample labels with ONE composed-affine NN gather instead of the
    # 9-pass one-hot shear chain — the ideal rotate+zoom semantics (rounds
    # once, like MONAI mode="nearest"); differs from the chain only where
    # per-pass rounding disagrees with the single rounding (boundary
    # voxels). MEASURED 25x SLOWER on TPU v5e (exp/label_affine_ab.py b96:
    # gather 1167 ms vs chain 45.6 ms/batch): the flat 1D take over the
    # 144^3 margin volume serializes on the scalar unit while the banded
    # one-hot chain rides the MXU. Kept opt-in for exact single-rounding
    # semantics on CPU/small volumes; default stays the shear chain.
    label_affine_gather: bool = False


# the composed rotation (shared with the shear chain's oracle tests)
_rotation_matrix = rotation_matrix


def _random_spatial_params(key: jax.Array, cfg: AugmentConfig, nd: int):
    k_rot_p, k_rot, k_zoom_p, k_zoom = jax.random.split(key, 4)
    n_rot = 3 if nd == 3 else 1
    angles = jax.random.uniform(
        k_rot, (n_rot,), minval=-cfg.rotate_range, maxval=cfg.rotate_range
    )
    do_rot = jax.random.uniform(k_rot_p, (n_rot,)) < cfg.rotate_prob
    angles = jnp.where(do_rot, angles, 0.0)
    zoom = jax.random.uniform(
        k_zoom, (), minval=cfg.zoom_range[0], maxval=cfg.zoom_range[1]
    )
    zoom = jnp.where(jax.random.uniform(k_zoom_p, ()) < cfg.zoom_prob, zoom, 1.0)
    return angles, zoom


def _augment_one(
    image: jax.Array,  # (C, *margin_shape) channel-first
    label: jax.Array,  # (1, *margin_shape)
    key: jax.Array,
    cfg: AugmentConfig,
    out_shape: Tuple[int, ...],
) -> Tuple[jax.Array, jax.Array]:
    nd = image.ndim - 1
    keys = jax.random.split(key, 8)

    if cfg.spatial:
        # shear-decomposed rotation + zoom as banded-interp matmuls; every
        # pass emits only the center window later passes need (static
        # bounds from the config ranges) — see ops/shear_resample.py
        angles, zoom = _random_spatial_params(keys[0], cfg, nd)
        zoom_min = min(cfg.zoom_range[0], 1.0)
        image = rotate_zoom_shear(
            image, angles, zoom, order=1, out_shape=out_shape,
            angle_max=cfg.rotate_range, zoom_min=zoom_min, bf16=cfg.interp_bf16,
        )
        if cfg.label_affine_gather:
            # one composed-affine NN gather (rounds once — the ideal
            # rotate+zoom label semantics); emits out_shape directly
            label = rotate_zoom_nn_gather(label, angles, zoom, out_shape)
        else:
            label = rotate_zoom_shear(
                label, angles, zoom, order=0, out_shape=out_shape,
                angle_max=cfg.rotate_range, zoom_min=zoom_min,
            )
    image = center_crop(image, out_shape)
    label = center_crop(label, out_shape)

    if cfg.intensity:
        k_c, k_h, k_b = jax.random.split(keys[1], 3)

        def maybe(k, prob, fn, x):
            kp, kv = jax.random.split(k)
            return jnp.where(jax.random.uniform(kp, ()) < prob, fn(kv, x), x)

        def contrast(kv, x):
            gamma = jax.random.uniform(
                kv, (), minval=cfg.contrast_gamma[0], maxval=cfg.contrast_gamma[1]
            )
            return iops.adjust_contrast(x, gamma)

        def hist(kv, x):
            src, dst = iops.random_control_points(
                kv, cfg.hist_control_points, jnp.min(x), jnp.max(x)
            )
            return iops.histogram_shift(x, src, dst)

        def bias(kv, x):
            n = iops.num_bias_coeff(nd, cfg.bias_degree)
            coeff = jax.random.uniform(
                kv, (n,), minval=cfg.bias_coeff_range[0], maxval=cfg.bias_coeff_range[1]
            )
            return iops.bias_field(x, coeff, cfg.bias_degree)

        image = maybe(k_c, cfg.contrast_prob, contrast, image)
        image = maybe(k_h, cfg.hist_shift_prob, hist, image)
        image = maybe(k_b, cfg.bias_prob, bias, image)
        # gibbs / k-space spike (3D-FFT heavy) are applied batch-level on a
        # fixed-size random subset — see augment_batch

    # per-axis random flips (always on, prob cfg.flip_prob each)
    do_flip = jax.random.uniform(keys[2], (nd,)) < cfg.flip_prob
    image = iops.flip(image, do_flip)
    label = iops.flip(label, do_flip)
    return image, label


def _subset_count(prob: float, batch: int) -> int:
    return int(round(prob * batch))


def _apply_subset_fft_aug(images, key, count, fn):
    """Apply an expensive aug to a random fixed-size subset of the batch.

    Exact-count semantics: a random permutation picks WHICH ``count`` samples
    get the aug (so the per-sample probability is count/B per step), and the
    FFT work is only ``count``/B of the masked-``where`` formulation.
    ``images`` is (B, C, *spatial) channel-first.
    """
    if count <= 0:
        return images
    k_perm, k_aug = jax.random.split(key)
    batch = images.shape[0]
    perm = jax.random.permutation(k_perm, batch)
    shuffled = jnp.take(images, perm, axis=0)
    sub_keys = jax.random.split(k_aug, count)
    augmented = jax.vmap(fn)(sub_keys, shuffled[:count])
    shuffled = jnp.concatenate([augmented, shuffled[count:]], axis=0)
    # unpermute so image/label pairing is preserved
    inv = jnp.argsort(perm)
    return jnp.take(shuffled, inv, axis=0)


@partial(jax.jit, static_argnames=("cfg", "out_shape"))
def augment_batch(
    images: jax.Array,  # (B, *margin_shape, C) channel-last
    labels: jax.Array,  # (B, *margin_shape) int
    key: jax.Array,
    cfg: AugmentConfig,
    out_shape: Tuple[int, ...],
) -> Tuple[jax.Array, jax.Array]:
    """Vmapped fused augmentation: margin patches in, training patches out.

    Returns (B, *out_shape, C) images and (B, *out_shape) labels.
    """
    batch = images.shape[0]
    key, k_gibbs, k_spike = jax.random.split(key, 3)
    keys = jax.random.split(key, batch)
    imgs_cf = jnp.moveaxis(images, -1, 1)  # (B, C, *spatial)
    # keep a compact integer wire dtype (uint8 labels) end-to-end: the NN
    # banded interp is exact for class ids <= 255 in bf16 either way, and
    # the full-volume int32 upcast is a materialized sweep
    lbls_cf = labels[:, None]
    if not jnp.issubdtype(lbls_cf.dtype, jnp.integer):
        lbls_cf = lbls_cf.astype(jnp.int32)

    aug = jax.vmap(lambda i, l, k: _augment_one(i, l, k, cfg, tuple(out_shape)))
    out_img, out_lbl = aug(imgs_cf, lbls_cf, keys)

    if cfg.intensity:
        nd = out_img.ndim - 2

        def gibbs(kv, x):
            alpha = jax.random.uniform(
                kv, (), minval=cfg.gibbs_alpha[0], maxval=cfg.gibbs_alpha[1]
            )
            return iops.gibbs_noise(x, alpha)

        def spike(kv, x):
            k1, k2 = jax.random.split(kv)
            loc = jax.random.uniform(k1, (nd,), minval=0.55, maxval=0.95)
            inten = jax.random.uniform(
                k2, (), minval=cfg.spike_intensity[0], maxval=cfg.spike_intensity[1]
            )
            return iops.kspace_spike(x, loc, inten)

        out_img = _apply_subset_fft_aug(
            out_img, k_gibbs, _subset_count(cfg.gibbs_prob, batch), gibbs
        )
        out_img = _apply_subset_fft_aug(
            out_img, k_spike, _subset_count(cfg.spike_prob, batch), spike
        )

    return jnp.moveaxis(out_img, 1, -1), out_lbl[:, 0]
