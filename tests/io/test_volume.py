import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin


def test_volume_geometry():
    v = Volume(
        data=np.zeros((1, 5, 5, 5), dtype=np.float32),
        affine=affine_from_spacing_origin((0.5, 0.6, 0.7), (1, 2, 3)),
    )
    np.testing.assert_allclose(v.spacing, [0.5, 0.6, 0.7])
    np.testing.assert_allclose(v.origin, [1, 2, 3])
    np.testing.assert_allclose(v.direction, np.eye(3))
    assert v.spatial_shape == (5, 5, 5)
    assert v.num_channels == 1


def test_voxel_physical_roundtrip():
    theta = 0.4
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    aff = affine_from_spacing_origin((1.0, 2.0, 0.5), (3, -1, 8), direction=rot)
    v = Volume(data=np.zeros((1, 4, 4, 4)), affine=aff)
    idx = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    pts = v.voxel_to_physical(idx)
    back = v.physical_to_voxel(pts)
    np.testing.assert_allclose(back, idx, atol=1e-9)
    np.testing.assert_allclose(pts[1], [3, -1, 8])


def test_volume_rejects_bad_shapes():
    with pytest.raises(ValueError):
        Volume(data=np.zeros((5, 5)))  # missing channel axis
    with pytest.raises(ValueError):
        Volume(data=np.zeros((1, 5, 5)), affine=np.eye(3))
