import numpy as np

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.image import processing


def _labelfield() -> Volume:
    arr = np.zeros((1, 5, 5, 5), dtype=np.uint16)
    for k in range(5):
        arr[0, :, :, k] = k
    return Volume(data=arr, affine=affine_from_spacing_origin((0.5, 0.6, 0.7)))


def test_extract_slices():
    vol = _labelfield()
    slices = processing.extract_slices(vol, axis=2)
    assert len(slices) == 5
    for k, sl in enumerate(slices):
        assert sl.data.shape == (1, 5, 5)
        np.testing.assert_allclose(sl.spacing, [0.5, 0.6])
        assert np.all(sl.numpy() == k)
        np.testing.assert_allclose(sl.affine[:3, 3], [0, 0, 0.7 * k])


def test_pad_crop_center_roundtrip():
    vol = _labelfield()
    padded = processing.pad(vol, target_size=(9, 9, 9))
    assert padded.spatial_shape == (9, 9, 9)
    cropped = processing.crop_center(padded, target_size=(5, 5, 5))
    np.testing.assert_allclose(cropped.spacing, vol.spacing)
    np.testing.assert_allclose(cropped.origin, vol.origin, atol=1e-12)
    np.testing.assert_array_equal(cropped.numpy(), vol.numpy())

    sl = processing.crop_center(vol, target_size=(5, 5, 1))
    assert sl.spatial_shape == (5, 5, 1)


def test_resample_doubles_size():
    vol = _labelfield()
    res = processing.resample(vol, target_spacing=[s / 2 for s in vol.spacing])
    assert res.spatial_shape == (10, 10, 10)
    np.testing.assert_allclose(res.spacing, vol.spacing / 2)
    np.testing.assert_allclose(res.origin, vol.origin)


def test_resample_to_ref():
    vol = _labelfield()
    ref = processing.make_image(
        (12, 10, 7), spacing=[s / 2 for s in vol.spacing], dtype=np.uint16
    )
    ref.affine[:3, 3] = [1.3, -2.1, 0.75]
    res = processing.resample_to_ref(vol, ref, nearest=True)
    assert res.spatial_shape == (12, 10, 7)
    np.testing.assert_allclose(res.spacing, ref.spacing)
    np.testing.assert_allclose(res.origin, ref.origin)


def test_crop_offset_geometry():
    vol = _labelfield()
    c = processing.crop(vol, (1, 2, 3), (3, 2, 1))
    assert c.spatial_shape == (3, 2, 1)
    np.testing.assert_allclose(c.origin, [0.5 * 1, 0.6 * 2, 0.7 * 3])
    assert np.all(c.numpy() == 3)
