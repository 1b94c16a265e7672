import numpy as np
import pytest
from scipy import ndimage

from segmantic_tpu import native
from segmantic_tpu.ops.resample import resample_affine_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_edt_matches_scipy():
    rng = np.random.default_rng(0)
    mask = rng.random((24, 20, 18)) > 0.97
    mask[0, 0, 0] = True  # ensure nonempty
    got = native.edt_distance_to_foreground(mask, spacing=(1.0, 1.5, 2.0))
    want = ndimage.distance_transform_edt(~mask, sampling=(1.0, 1.5, 2.0))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_edt_2d():
    mask = np.zeros((10, 10), bool)
    mask[5, 5] = True
    got = native.edt_distance_to_foreground(mask)
    want = ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_native_resample_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((2, 12, 11, 10)).astype(np.float32)
    theta = 0.3
    m = np.zeros((3, 4))
    m[0, 0], m[0, 1] = np.cos(theta), -np.sin(theta)
    m[1, 0], m[1, 1] = np.sin(theta), np.cos(theta)
    m[2, 2] = 0.8
    m[:, 3] = [0.5, -0.2, 0.7]
    for order in (0, 1):
        got = native.resample_affine(data, m, (9, 9, 9), order=order)
        want = resample_affine_np(data, m, (9, 9, 9), order=order)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_surface_extraction_cube():
    lbl = np.zeros((10, 10, 10), np.uint16)
    lbl[3:7, 3:7, 3:7] = 1
    verts, tris = native.extract_label_surface(
        lbl, np.eye(4), 1, smooth_iters=0, method="voxel"
    )
    # 4x4x4 cube: 6 faces x 16 quads x 2 triangles
    assert len(tris) == 6 * 16 * 2
    assert len(verts) > 0
    # vertices sit on voxel-corner grid around the cube
    assert verts.min() >= 2.4 and verts.max() <= 6.6


def test_surface_ply_roundtrip(tmp_path):
    lbl = np.zeros((6, 6, 6), np.uint16)
    lbl[2:4, 2:4, 2:4] = 3
    verts, tris = native.extract_label_surface(lbl, np.eye(4), 3, smooth_iters=2)
    out = tmp_path / "mesh.ply"
    native.write_ply(out, verts, tris)
    text = out.read_text()
    assert text.startswith("ply")
    assert f"element vertex {len(verts)}" in text
    assert f"element face {len(tris)}" in text


def test_surface_net_sphere_smoother_than_voxel():
    # sphere mask: surface-net vertices should hug the radius much tighter
    n = 24
    g = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    c = (n - 1) / 2
    r2 = sum((gg - c) ** 2 for gg in g)
    lbl = (r2 < 8.0**2).astype(np.uint16)

    def radial_spread(method, smooth):
        verts, tris = native.extract_label_surface(
            lbl, np.eye(4), 1, smooth_iters=smooth, method=method
        )
        radii = np.linalg.norm(verts - c, axis=1)
        assert len(tris) > 0
        # watertight: every directed edge count matches its reverse
        edges = {}
        for t in tris:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges[(a, b)] = edges.get((a, b), 0) + 1
        for (a, b), cnt in edges.items():
            assert cnt == edges.get((b, a), 0), "non-watertight"
        return radii.std()

    spread_net = radial_spread("surface_net", smooth=0)
    spread_vox = radial_spread("voxel", smooth=0)
    assert spread_net < spread_vox * 0.8, (spread_net, spread_vox)


def test_surface_net_cube_counts():
    lbl = np.zeros((10, 10, 10), np.uint16)
    lbl[3:7, 3:7, 3:7] = 1
    verts, tris = native.extract_label_surface(
        lbl, np.eye(4), 1, smooth_iters=0, method="surface_net"
    )
    # 4^3 cube: 6 faces x 4x4 crossing edges x 2 triangles
    assert len(tris) == 6 * 16 * 2
    assert len(verts) > 0


def test_native_resample_2d():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((1, 15, 13)).astype(np.float32)
    theta = 0.25
    m = np.array(
        [[np.cos(theta), -np.sin(theta), 1.0], [np.sin(theta), np.cos(theta), -0.5]]
    )
    for order in (0, 1):
        got = native.resample_affine(data, m, (11, 12), order=order)
        want = resample_affine_np(data, m, (11, 12), order=order)
        np.testing.assert_allclose(got, want, atol=2e-4)


def _mesh_stats(verts, tris):
    from collections import Counter

    directed = Counter()
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            directed[(u, v)] += 1
    watertight = all(c == 1 for c in directed.values()) and all(
        directed.get((v, u), 0) == 1 for (u, v) in directed
    )
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    cross = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cross, axis=1).sum()
    volume = abs((v0 * cross).sum() / 6.0)
    return watertight, area, volume


def test_marching_tetrahedra_sphere_quality():
    """The triangle isosurface mesher must be watertight and recover the
    analytic sphere area/volume far better than the voxel-face quads
    (the FlyingEdges-quality requirement)."""
    n = 32
    g = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt(((g - (n - 1) / 2) ** 2).sum(0))
    lbl = (r < 11).astype(np.uint16)

    v_mc, t_mc = native.extract_label_surface(
        lbl, np.eye(4), 1, smooth_iters=10, method="marching"
    )
    v_vox, t_vox = native.extract_label_surface(
        lbl, np.eye(4), 1, smooth_iters=0, method="voxel"
    )
    wt, area, vol = _mesh_stats(v_mc, t_mc)
    _, area_vox, _ = _mesh_stats(v_vox, t_vox)

    true_area = 4 * np.pi * 11**2
    true_vol = 4 / 3 * np.pi * 11**3
    assert wt
    assert abs(area - true_area) / true_area < 0.02
    assert abs(vol - true_vol) / true_vol < 0.03
    # voxel quads overestimate area by ~50%; marching must beat them clearly
    assert abs(area - true_area) < 0.2 * abs(area_vox - true_area)


def test_decimation_reduces_triangles_preserves_shape():
    n = 32
    g = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt(((g - (n - 1) / 2) ** 2).sum(0))
    lbl = (r < 11).astype(np.uint16)
    verts, tris = native.extract_label_surface(
        lbl, np.eye(4), 1, smooth_iters=10, method="marching"
    )
    dv, dt = native.decimate_mesh(verts, tris, 0.8)
    assert len(dt) <= 0.25 * len(tris)
    wt, area, vol = _mesh_stats(dv, dt)
    _, area0, vol0 = _mesh_stats(verts, tris)
    assert wt
    assert abs(area - area0) / area0 < 0.02
    assert abs(vol - vol0) / vol0 < 0.02


def test_marching_affine_applied():
    lbl = np.zeros((8, 8, 8), np.uint16)
    lbl[2:6, 2:6, 2:6] = 1
    aff = np.diag([2.0, 1.0, 0.5, 1.0])
    aff[:3, 3] = [10.0, -5.0, 1.0]
    verts, tris = native.extract_label_surface(
        lbl, aff, 1, smooth_iters=0, method="marching"
    )
    v_id, _ = native.extract_label_surface(
        lbl, np.eye(4), 1, smooth_iters=0, method="marching"
    )
    expect = v_id * np.array([2.0, 1.0, 0.5]) + np.array([10.0, -5.0, 1.0])
    np.testing.assert_allclose(np.sort(verts, axis=0), np.sort(expect, axis=0), atol=1e-5)
