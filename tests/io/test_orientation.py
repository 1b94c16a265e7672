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


def _phys_map(a, affine):
    """{physical point -> value} for every voxel of a channel-first array."""
    nd = a.ndim - 1
    pts = {}
    for idx in np.ndindex(a.shape[1:]):
        h = np.array(list(idx) + [0] * (3 - nd) + [1.0])
        p = np.asarray(affine) @ h
        pts[tuple(np.round(p[:3], 6))] = a[(0, *idx)]
    return pts


def test_reorient_arbitrary_target_axcodes():
    from segmantic_tpu.core.orientation import reorient_to_axcodes, invert_orientation

    rng = np.random.default_rng(1)
    data = rng.integers(0, 9, size=(1, 3, 4, 5)).astype(np.float32)
    aff = np.zeros((4, 4))
    aff[0, 1], aff[1, 2], aff[2, 0] = -0.7, -1.1, 2.0
    aff[:3, 3] = [10.0, -4.0, 3.0]
    aff[3, 3] = 1.0

    for target in ("RAS", "LPS", "AIR", "SLP"):
        out, new_aff, perm, flips = reorient_to_axcodes(data, aff, target)
        assert axcodes(new_aff) == tuple(target)
        assert _phys_map(data, aff) == _phys_map(out, new_aff)
        back, back_aff = invert_orientation(out, perm, flips, aff)
        np.testing.assert_array_equal(back, data)
        np.testing.assert_allclose(back_aff, aff)


def test_reorient_2d_flipped_affine():
    """A negative-determinant 2D affine must flip the data, not pass through."""
    from segmantic_tpu.core.orientation import reorient_to_axcodes, invert_orientation

    rng = np.random.default_rng(2)
    data = rng.integers(0, 9, size=(1, 4, 6)).astype(np.float32)
    aff = np.eye(4)
    aff[0, 0] = -1.25  # axis 0 points L
    aff[1, 1] = 0.8
    aff[0, 3] = 7.0

    out, new_aff, perm, flips = reorient_to_axcodes(data, aff, "RAS")
    assert flips == [0]
    np.testing.assert_array_equal(out, data[:, ::-1, :])
    assert _phys_map(data, aff) == _phys_map(out, new_aff)
    back, back_aff = invert_orientation(out, perm, flips, aff)
    np.testing.assert_array_equal(back, data)


def test_reorient_2d_coronal_slice():
    """A coronal slice (axes span R and S) orients within its own plane."""
    from segmantic_tpu.core.orientation import reorient_to_axcodes, axcodes as codes_of

    rng = np.random.default_rng(3)
    data = rng.integers(0, 9, size=(1, 4, 5)).astype(np.float32)
    # voxel axis 0 -> -S (I), voxel axis 1 -> +R; plane normal is A/P
    aff = np.zeros((4, 4))
    aff[2, 0] = -1.0
    aff[0, 1] = 1.0
    aff[1, 2] = 1.0  # out-of-plane direction
    aff[3, 3] = 1.0

    out, new_aff, perm, flips = reorient_to_axcodes(data, aff, "RAS")
    # target restricted to the R and S axes present, in RAS order: R then S
    assert codes_of(new_aff, ndim=2) == ("R", "S")
    assert _phys_map(data, aff) == _phys_map(out, new_aff)


def test_reorient_roundtrip_random_affines_property():
    """Property test: random permutation/sign/shear affines round-trip in
    2D and 3D for several targets, incl. negative determinants."""
    from segmantic_tpu.core.orientation import reorient_to_axcodes, invert_orientation

    rng = np.random.default_rng(4)
    for trial in range(30):
        nd = 2 if trial % 2 == 0 else 3
        shape = tuple(rng.integers(2, 6, nd))
        data = rng.standard_normal((1,) + shape).astype(np.float32)

        # random axis assignment with random signs + small shear
        aff = np.zeros((4, 4))
        phys = rng.permutation(3)[:nd]
        for v in range(nd):
            aff[phys[v], v] = rng.choice([-1, 1]) * rng.uniform(0.5, 2.0)
        aff[:3, :nd] += rng.normal(0, 0.05, (3, nd))  # shear, keeps dominance
        if nd == 2:  # out-of-plane column for a consistent 3-space embedding
            missing = [p for p in range(3) if p not in phys][0]
            aff[missing, 2] = 1.0
        aff[:3, 3] = rng.normal(0, 10, 3)
        aff[3, 3] = 1.0

        target = ["RAS", "LPI", "ASR"][trial % 3]
        out, new_aff, perm, flips = reorient_to_axcodes(data, aff, target)
        assert _phys_map(data, aff) == _phys_map(out, new_aff)
        back, back_aff = invert_orientation(out, perm, flips, aff)
        np.testing.assert_array_equal(back, data)
        np.testing.assert_allclose(back_aff, aff)
