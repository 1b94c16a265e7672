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
    # run the rotation+zoom chain on an EXACT-COUNT random batch subset
    # (count = round(P[any rotation or zoom] * B)) instead of vmapping the
    # full chain over every sample: under vmap, samples that draw the
    # identity transform (0.8^3 * 0.8 ~ 41% at the default probs) still
    # execute all 9 banded passes. Same batch-subset semantics as the
    # Gibbs/spike FFT augs (per-sample probability = count/B per step;
    # subset members draw their params CONDITIONED on being active, so the
    # joint (angles, zoom) distribution per augmented sample is exact) and
    # per-step work is constant. Disable for the independent-Bernoulli
    # per-sample gating semantics.
    spatial_subset: bool = True


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


def _spatial_pattern_table(cfg: AugmentConfig, n_rot: int):
    """Static table of ACTIVE (rot-axis mask, zoom) patterns and the CDF of
    their probabilities conditioned on at-least-one-active.

    Bit k (< n_rot) = rotate axis k; bit n_rot = zoom. Computed at trace
    time from the static config probabilities (numpy constants)."""
    import numpy as np

    pr, pz = cfg.rotate_prob, cfg.zoom_prob
    pats, probs = [], []
    for bits in range(1, 2 ** (n_rot + 1)):
        rot_bits = [(bits >> a) & 1 for a in range(n_rot)]
        z_bit = (bits >> n_rot) & 1
        p = float(np.prod([pr if b else 1 - pr for b in rot_bits]))
        p *= pz if z_bit else 1 - pz
        pats.append(rot_bits + [z_bit])
        probs.append(p)
    probs = np.asarray(probs, np.float64)
    cdf = np.cumsum(probs / probs.sum())[:-1]
    return (np.asarray(pats, np.float32), cdf.astype(np.float32))


def _draw_active_spatial_params(key: jax.Array, cfg: AugmentConfig, nd: int):
    """(angles, zoom) | at-least-one-active: inverse-CDF over the active
    pattern table, then the usual uniform magnitudes for the active bits."""
    n_rot = 3 if nd == 3 else 1
    pats, cdf = _spatial_pattern_table(cfg, n_rot)
    k_pat, k_ang, k_zoom = jax.random.split(key, 3)
    u = jax.random.uniform(k_pat, ())
    idx = jnp.sum(u >= jnp.asarray(cdf)).astype(jnp.int32)
    bits = jnp.asarray(pats)[idx]  # (n_rot + 1,)
    angles = bits[:n_rot] * jax.random.uniform(
        k_ang, (n_rot,), minval=-cfg.rotate_range, maxval=cfg.rotate_range
    )
    zoom = jax.random.uniform(
        k_zoom, (), minval=cfg.zoom_range[0], maxval=cfg.zoom_range[1]
    )
    zoom = jnp.where(bits[n_rot] > 0, zoom, 1.0)
    return angles, zoom


def _crop_batch(x: jax.Array, out_shape) -> jax.Array:
    """Center crop the spatial dims of a (B, C, *spatial) tensor."""
    nd = x.ndim - 2
    sl = (slice(None), slice(None)) + tuple(
        slice((x.shape[2 + a] - out_shape[a]) // 2,
              (x.shape[2 + a] - out_shape[a]) // 2 + out_shape[a])
        for a in range(nd)
    )
    return x[sl]


def _apply_subset_spatial(images, labels, key, cfg: AugmentConfig, out_shape):
    """Rotation+zoom on an exact-count random subset of the batch.

    ``images`` (B, C, *margin), ``labels`` (B, 1, *margin) channel-first.
    A random permutation picks WHICH count = round(P[any spatial] * B)
    samples run the 9-pass chain (with params drawn conditioned on being
    active); the rest take the static center crop. Per-sample probability
    and the per-augmented-sample (angles, zoom) joint match the
    independent-Bernoulli gating exactly up to count rounding — the same
    exact-count semantics as the Gibbs/spike batch subsets."""
    nd = images.ndim - 2
    n_rot = 3 if nd == 3 else 1
    batch = images.shape[0]
    p_any = 1.0 - (1.0 - cfg.rotate_prob) ** n_rot * (1.0 - cfg.zoom_prob)
    count = _subset_count(p_any, batch)
    if count <= 0:
        return _crop_batch(images, out_shape), _crop_batch(labels, out_shape)

    k_perm, k_par = jax.random.split(key)
    perm = jax.random.permutation(k_perm, batch)
    im_s = jnp.take(images, perm, axis=0)
    lb_s = jnp.take(labels, perm, axis=0)
    zoom_min = min(cfg.zoom_range[0], 1.0)

    def chain(k, img, lbl):
        angles, zoom = _draw_active_spatial_params(k, cfg, nd)
        img = rotate_zoom_shear(
            img, angles, zoom, order=1, out_shape=out_shape,
            angle_max=cfg.rotate_range, zoom_min=zoom_min,
            bf16=cfg.interp_bf16,
        )
        if cfg.label_affine_gather:
            lbl = rotate_zoom_nn_gather(lbl, angles, zoom, out_shape)
        else:
            lbl = rotate_zoom_shear(
                lbl, angles, zoom, order=0, out_shape=out_shape,
                angle_max=cfg.rotate_range, zoom_min=zoom_min,
            )
        return img, lbl

    sub_keys = jax.random.split(k_par, count)
    aug_i, aug_l = jax.vmap(chain)(sub_keys, im_s[:count], lb_s[:count])
    im_s = jnp.concatenate([aug_i, _crop_batch(im_s[count:], out_shape)], 0)
    lb_s = jnp.concatenate([aug_l, _crop_batch(lb_s[count:], out_shape)], 0)
    inv = jnp.argsort(perm)  # unpermute: image/label pairing preserved
    return jnp.take(im_s, inv, axis=0), jnp.take(lb_s, inv, axis=0)


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
    key, k_gibbs, k_spike, k_spatial = jax.random.split(key, 4)
    keys = jax.random.split(key, batch)
    imgs_cf = jnp.moveaxis(images, -1, 1)  # (B, C, *spatial)
    # keep a compact integer wire dtype (uint8 labels) end-to-end: the NN
    # banded interp is exact for class ids <= 255 in bf16 either way, and
    # the full-volume int32 upcast is a materialized sweep
    lbls_cf = labels[:, None]
    if not jnp.issubdtype(lbls_cf.dtype, jnp.integer):
        lbls_cf = lbls_cf.astype(jnp.int32)

    sub_cfg = cfg
    if cfg.spatial and cfg.spatial_subset and batch > 1:
        # exact-count batch-subset rotation+zoom (see AugmentConfig); the
        # per-sample pass below then skips its own spatial section (its
        # center crop is a no-op on the already-cropped tensors)
        imgs_cf, lbls_cf = _apply_subset_spatial(
            imgs_cf, lbls_cf, k_spatial, cfg, tuple(out_shape)
        )
        sub_cfg = dataclasses.replace(cfg, spatial=False)

    aug = jax.vmap(
        lambda i, l, k: _augment_one(i, l, k, sub_cfg, tuple(out_shape))
    )
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
