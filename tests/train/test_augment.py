import jax
import jax.numpy as jnp
import numpy as np

from segmantic_tpu.train.augment import AugmentConfig, augment_batch


def _batch(margin_shape=(12, 12, 12), b=2, c=1, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b,) + margin_shape + (c,)).astype(np.float32)
    lbl = rng.integers(0, 3, (b,) + margin_shape).astype(np.int32)
    return jnp.asarray(img), jnp.asarray(lbl)


def test_center_crop_no_aug():
    img, lbl = _batch()
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    out_img, out_lbl = augment_batch(img, lbl, jax.random.key(0), cfg, (8, 8, 8))
    assert out_img.shape == (2, 8, 8, 8, 1)
    assert out_lbl.shape == (2, 8, 8, 8)
    # pure center crop
    np.testing.assert_array_equal(
        np.asarray(out_img[0, ..., 0]), np.asarray(img[0, 2:10, 2:10, 2:10, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(out_lbl[0]), np.asarray(lbl[0, 2:10, 2:10, 2:10])
    )


def test_spatial_aug_shapes_and_label_integrity():
    img, lbl = _batch()
    cfg = AugmentConfig(
        spatial=True, intensity=False, rotate_prob=1.0, zoom_prob=1.0, flip_prob=0.5
    )
    out_img, out_lbl = augment_batch(img, lbl, jax.random.key(1), cfg, (8, 8, 8))
    assert out_img.shape == (2, 8, 8, 8, 1)
    assert out_lbl.dtype == jnp.int32
    assert set(np.unique(np.asarray(out_lbl))) <= {0, 1, 2}
    assert np.isfinite(np.asarray(out_img)).all()


def test_intensity_aug_changes_image_only():
    img, lbl = _batch()
    cfg_off = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    cfg_on = AugmentConfig(
        spatial=False,
        intensity=True,
        flip_prob=0.0,
        contrast_prob=1.0,
        hist_shift_prob=1.0,
        bias_prob=1.0,
        gibbs_prob=1.0,
        spike_prob=1.0,
    )
    base_img, base_lbl = augment_batch(img, lbl, jax.random.key(2), cfg_off, (8, 8, 8))
    aug_img, aug_lbl = augment_batch(img, lbl, jax.random.key(2), cfg_on, (8, 8, 8))
    assert not np.array_equal(np.asarray(base_img), np.asarray(aug_img))
    np.testing.assert_array_equal(np.asarray(base_lbl), np.asarray(aug_lbl))
    assert np.isfinite(np.asarray(aug_img)).all()


def test_deterministic_per_key():
    img, lbl = _batch()
    cfg = AugmentConfig(spatial=True, intensity=True)
    a1 = augment_batch(img, lbl, jax.random.key(7), cfg, (8, 8, 8))
    a2 = augment_batch(img, lbl, jax.random.key(7), cfg, (8, 8, 8))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    b = augment_batch(img, lbl, jax.random.key(8), cfg, (8, 8, 8))
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(b[0]))


def test_spatial_subset_exact_count():
    """The exact-count subset path augments exactly round(P[any]*B) samples
    (the rest are bit-identical to the static center crop)."""
    img, lbl = _batch(b=10)
    base = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    cfg = AugmentConfig(spatial=True, intensity=False, flip_prob=0.0)
    crop_i, _ = augment_batch(img, lbl, jax.random.key(0), base, (8, 8, 8))
    out_i, _ = augment_batch(img, lbl, jax.random.key(5), cfg, (8, 8, 8))
    diff = [
        not np.array_equal(np.asarray(out_i[i]), np.asarray(crop_i[i]))
        for i in range(10)
    ]
    expected = round((1 - 0.8**3 * 0.8) * 10)  # = 6 at the default probs
    assert sum(diff) == expected, diff


def test_spatial_subset_zero_prob_is_pure_crop():
    img, lbl = _batch(b=4)
    base = AugmentConfig(spatial=False, intensity=False, flip_prob=0.0)
    cfg = AugmentConfig(spatial=True, intensity=False, flip_prob=0.0,
                        rotate_prob=0.0, zoom_prob=0.0)
    a = augment_batch(img, lbl, jax.random.key(1), base, (8, 8, 8))
    b = augment_batch(img, lbl, jax.random.key(1), cfg, (8, 8, 8))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_spatial_subset_off_keeps_bernoulli_path():
    """spatial_subset=False restores the independent per-sample gating."""
    img, lbl = _batch(b=4)
    cfg = AugmentConfig(spatial=True, intensity=False, flip_prob=0.0,
                        rotate_prob=1.0, zoom_prob=1.0, spatial_subset=False)
    out_img, out_lbl = augment_batch(img, lbl, jax.random.key(2), cfg, (8, 8, 8))
    assert out_img.shape == (4, 8, 8, 8, 1)
    assert set(np.unique(np.asarray(out_lbl))) <= {0, 1, 2}
    a2 = augment_batch(img, lbl, jax.random.key(2), cfg, (8, 8, 8))
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(a2[0]))


def test_flip_only_is_involution_consistent():
    img, lbl = _batch()
    cfg = AugmentConfig(spatial=False, intensity=False, flip_prob=1.0)
    out_img, out_lbl = augment_batch(img, lbl, jax.random.key(3), cfg, (8, 8, 8))
    # flipping all axes of the center crop
    crop = np.asarray(img[0, 2:10, 2:10, 2:10, 0])
    np.testing.assert_array_equal(
        np.asarray(out_img[0, ..., 0]), crop[::-1, ::-1, ::-1]
    )
