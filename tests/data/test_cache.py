import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.data.cache import (
    PatchSampler,
    PrefetchLoader,
    VolumeCache,
    _crop_with_pad,
)
from segmantic_tpu.io.nifti import write_volume
from segmantic_tpu.train.trainer import default_preprocessing


@pytest.fixture
def files(tmp_path):
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    out = []
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.standard_normal((1, 20, 20, 20)).astype(np.float32)
        lbl = np.zeros((1, 20, 20, 20), np.int32)
        lbl[0, 5:15, 5:15, 5:15] = 1
        lbl[0, 8:12, 8:12, 8:12] = 2
        write_volume(tmp_path / f"img{i}.nii.gz", Volume(data=img, affine=aff))
        write_volume(
            tmp_path / f"lbl{i}.nii.gz",
            Volume(data=lbl.astype(np.uint8), affine=aff.copy()),
        )
        out.append(
            {"image": tmp_path / f"img{i}.nii.gz", "label": tmp_path / f"lbl{i}.nii.gz"}
        )
    return out


def test_crop_with_pad():
    data = np.arange(2 * 4 * 4 * 4).reshape(2, 4, 4, 4).astype(np.float32)
    out = _crop_with_pad(data, (-1, 0, 2), (3, 3, 3))
    assert out.shape == (2, 3, 3, 3)
    assert np.all(out[:, 0] == 0)  # padded region
    np.testing.assert_array_equal(out[:, 1:, :3, :2], data[:, :2, :3, 2:4])


def test_volume_cache_and_class_indices(files):
    pre = default_preprocessing(["image", "label"])
    cache = VolumeCache(files, pre, num_classes=3, cache_rate=1.0)
    assert len(cache) == 3
    vol = cache[0]
    assert vol.class_indices is not None
    lbl = vol.label.numpy().reshape(-1)
    for c in range(3):
        assert len(vol.class_indices[c]) == (lbl == c).sum()
        assert np.all(lbl[vol.class_indices[c]] == c)


def test_cache_rate_partial(files):
    pre = default_preprocessing(["image", "label"])
    cache = VolumeCache(files, pre, num_classes=3, cache_rate=0.34)
    assert len(cache._cache) == 1
    # uncached access still works (lazy recompute)
    assert cache[2].spatial_shape == cache[0].spatial_shape


def test_patch_sampler_batches(files):
    pre = default_preprocessing(["image", "label"])
    cache = VolumeCache(files, pre, num_classes=3)
    sampler = PatchSampler(
        cache, patch_size=(8, 8, 8), batch_size=6, num_samples=2, margin=2, seed=0
    )
    img_b, lbl_b = sampler.sample_batch()
    assert img_b.shape == (6, 12, 12, 12, 1)  # margin 2 per side
    assert lbl_b.shape == (6, 12, 12, 12)
    # labels use the compact uint8 wire dtype for <=256 classes
    assert img_b.dtype == np.float32 and lbl_b.dtype == np.uint8
    # class-balanced: centers (margin center voxel) are foreground
    centers = lbl_b[:, 6, 6, 6]
    assert np.all(centers > 0)


def test_patch_sampler_deterministic(files):
    pre = default_preprocessing(["image", "label"])
    cache = VolumeCache(files, pre, num_classes=3)
    s1 = PatchSampler(cache, (8, 8, 8), 4, seed=42)
    s2 = PatchSampler(cache, (8, 8, 8), 4, seed=42)
    a = s1.sample_batch()
    b = s2.sample_batch()
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_prefetch_loader(files):
    pre = default_preprocessing(["image", "label"])
    cache = VolumeCache(files, pre, num_classes=3)
    loader = PrefetchLoader(PatchSampler(cache, (8, 8, 8), 2, seed=0))
    try:
        for _ in range(3):
            img_b, lbl_b = loader.next()
            assert img_b.shape[0] == 2
    finally:
        loader.stop()


def test_native_cropper_matches_python_path():
    """The C++ batched cropper must be bit-identical to the numpy path
    (both wire dtypes), including zero padding at volume borders."""
    import jax.numpy as jnp

    from segmantic_tpu import native
    from segmantic_tpu.core.volume import Volume
    from segmantic_tpu.data.cache import CachedVolume, PatchSampler

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 30, 28, 26)).astype(np.float32)
    lbl = rng.integers(0, 4, (1, 30, 28, 26)).astype(np.int32)
    cv = CachedVolume({"image": Volume(data=img), "label": Volume(data=lbl)}, 4)

    class OneVolCache:
        num_classes = 4

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return cv

    for wire in (np.float32, jnp.bfloat16):
        kw = dict(patch_size=[16, 16, 16], batch_size=6, num_samples=3,
                  margin=8, seed=3, image_wire_dtype=wire)
        s_native = PatchSampler(OneVolCache(), **kw)
        s_python = PatchSampler(OneVolCache(), **kw)
        s_python._native_ok = staticmethod(lambda picks: False)
        i1, l1 = s_native.sample_batch()
        i2, l2 = s_python.sample_batch()
        assert i1.dtype == i2.dtype and l1.dtype == l2.dtype
        np.testing.assert_array_equal(
            np.asarray(i1, np.float32), np.asarray(i2, np.float32)
        )
        np.testing.assert_array_equal(l1, l2)


def test_patch_sampler_clamps_crops_inside_volume():
    """Edge-centered class voxels must yield FULLY-REAL patches: the crop
    window is clamped inside the volume like MONAI's correct_crop_centers
    (reference: RandCropByLabelClassesd, monai_unet.py:195-203); only the
    augmentation margin may reach into zero padding. Unclamped starts fed
    ~half-synthetic patches and slowed convergence ~2x
    (exp/headtohead_torch.py)."""
    from segmantic_tpu.core.volume import Volume
    from segmantic_tpu.data.cache import CachedVolume, PatchSampler

    img = np.zeros((1, 20, 20, 20), np.float32)
    lbl = np.zeros((1, 20, 20, 20), np.int32)
    lbl[0, 0, 0, 0] = 1   # class voxel in the very corner
    lbl[0, 19, 19, 19] = 2
    img[0] = 1.0
    cv = CachedVolume({"image": Volume(data=img), "label": Volume(data=lbl)}, 3)

    class OneVolCache:
        num_classes = 3

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return cv

    s = PatchSampler(OneVolCache(), patch_size=(16, 16, 16), batch_size=8,
                     num_samples=8, margin=0, seed=0)
    img_b, lbl_b = s.sample_batch()
    # every patch lies inside the volume: no zero padding anywhere
    assert np.all(img_b == 1.0)

    # volume smaller than the patch: centered symmetric padding
    s2 = PatchSampler(OneVolCache(), patch_size=(32, 32, 32), batch_size=2,
                      num_samples=2, margin=0, seed=0)
    img_b2, _ = s2.sample_batch()
    assert img_b2.shape[1:4] == (32, 32, 32)
    core = img_b2[:, 6:26, 6:26, 6:26, 0]
    assert np.all(core == 1.0)
    assert np.all(img_b2[:, :6] == 0.0) and np.all(img_b2[:, 26:] == 0.0)
