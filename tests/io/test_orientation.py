import numpy as np

from segmantic_tpu.core.orientation import (
    axcodes,
    inverse_orientation_op,
    reorient_arrays_to_ras,
)
from segmantic_tpu.core.volume import affine_from_spacing_origin


def test_axcodes_identity():
    assert axcodes(np.eye(4)) == ("R", "A", "S")


def test_axcodes_flips_and_perms():
    aff = np.eye(4)
    aff[0, 0] = -1  # L
    assert axcodes(aff) == ("L", "A", "S")

    # permuted: voxel axis 0 -> S, 1 -> R, 2 -> A
    aff = np.zeros((4, 4))
    aff[2, 0] = 1
    aff[0, 1] = 1
    aff[1, 2] = 1
    aff[3, 3] = 1
    assert axcodes(aff) == ("S", "R", "A")


def test_reorient_to_ras_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 9, size=(1, 3, 4, 5)).astype(np.float32)

    # LPS affine with permutation: axis0->-x, axis1->-y, axis2->z plus perm
    aff = np.zeros((4, 4))
    aff[0, 1] = -0.7
    aff[1, 2] = -1.1
    aff[2, 0] = 2.0
    aff[:3, 3] = [10.0, -4.0, 3.0]
    aff[3, 3] = 1.0

    out, new_aff = reorient_arrays_to_ras(data, aff)
    assert axcodes(new_aff) == ("R", "A", "S")

    # physical location of every voxel is preserved
    def phys(a, affine):
        pts = {}
        for i in range(a.shape[1]):
            for j in range(a.shape[2]):
                for k in range(a.shape[3]):
                    p = affine @ np.array([i, j, k, 1.0])
                    pts[tuple(np.round(p[:3], 6))] = a[0, i, j, k]
        return pts

    assert phys(data, aff) == phys(out, new_aff)

    # inverse restores original array
    back, back_aff = inverse_orientation_op(out, new_aff, aff)
    np.testing.assert_array_equal(back, data)
    np.testing.assert_allclose(back_aff, aff)


def test_reorient_identity_is_noop():
    data = np.zeros((1, 2, 3, 4), dtype=np.float32)
    aff = affine_from_spacing_origin((1, 1, 1))
    out, new_aff = reorient_arrays_to_ras(data, aff)
    assert out.shape == data.shape
    np.testing.assert_allclose(new_aff, aff)
