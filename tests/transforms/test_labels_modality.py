import numpy as np

from segmantic_tpu.core.volume import Volume
from segmantic_tpu.image import labels as L
from segmantic_tpu.image import modality as M


def test_tissue_list_roundtrip(tmp_path):
    tissues = {"Bone": 1, "Fat": 2, "Skin": 3}
    p = tmp_path / "tissues.txt"
    L.save_tissue_list(tissues, p)
    loaded = L.load_tissue_list(p)
    assert loaded == {"Background": 0, **tissues}
    colors = L.load_tissue_colors(p)
    assert colors[0] == (0.0, 0.0, 0.0)
    assert len(colors) == 4


def test_build_tissue_mapping():
    inp = {"Background": 0, "Bone_a": 1, "Bone_b": 2, "Fat": 3}

    def mapper(n):
        return "Bone" if n.startswith("Bone") else n

    out_map, lut = L.build_tissue_mapping(inp, mapper)
    assert out_map == {"Background": 0, "Bone": 1, "Fat": 2}
    np.testing.assert_array_equal(lut, [0, 1, 1, 2])


def test_decathlon_tissuelist(tmp_path):
    p = tmp_path / "dataset.json"
    p.write_text('{"labels": {"1": "A", "2": "B"}}')
    assert L.load_decathlon_tissuelist(p) == {"Background": 0, "A": 1, "B": 2}


def test_scale_clamp_ct_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.uniform(-500, 2000, (1, 8, 8, 8)).astype(np.float32)
    vol = Volume(data=data)
    scaled = M.scale_clamp_ct(vol)
    assert scaled.numpy().min() >= 0 and scaled.numpy().max() <= 255
    back = M.unscale_ct(scaled)
    # median filter changes values, but range mapping must invert exactly:
    direct = M.unscale_ct(
        vol.with_data((np.clip(data, -1100, 3100) + 1100) * (255.0 / 4200.0))
    )
    np.testing.assert_allclose(direct.numpy(), np.clip(data, -1100, 3100), atol=1e-3)
    assert back.numpy().shape == data.shape


def test_otsu_separates_bimodal():
    rng = np.random.default_rng(1)
    a = rng.normal(10, 1, 5000)
    b = rng.normal(100, 5, 5000)
    t = M.otsu_threshold(np.concatenate([a, b]))
    # any threshold in the gap is a valid Otsu optimum; require clean separation
    assert np.mean(a > t) < 0.01
    assert np.mean(b > t) > 0.99


def test_bias_correct_reduces_bias():
    rng = np.random.default_rng(2)
    shape = (1, 24, 24, 24)
    truth = np.full(shape, 100.0, dtype=np.float32)
    # smooth multiplicative bias field
    x = np.linspace(-1, 1, 24)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    bias = np.exp(0.5 * gx + 0.3 * gy - 0.2 * gz)[None]
    corrupted = truth * bias.astype(np.float32)
    vol = Volume(data=corrupted)
    mask = Volume(data=np.ones(shape, dtype=np.uint8))
    corrected = M.bias_correct(
        vol, mask=mask, shrink_factor=2, num_fitting_levels=3, num_iterations=30
    )
    out = corrected.numpy()
    # coefficient of variation should drop substantially
    cv_before = corrupted.std() / corrupted.mean()
    cv_after = out.std() / out.mean()
    assert cv_after < cv_before * 0.2, (cv_before, cv_after)


def test_fit_bspline_field_recovers_smooth_field():
    x = np.linspace(-1, 1, 20)
    gx, gy = np.meshgrid(x, x, indexing="ij")
    truth = 0.4 * gx + 0.2 * gy * gy
    mask = np.ones_like(truth, bool)
    mask[5:8, 5:8] = False  # hole: spline must interpolate through
    fit = M.fit_bspline_field(truth, mask, cells=4)
    assert np.abs(fit - truth).max() < 0.02


def test_bias_correct_bspline_mode():
    rng = np.random.default_rng(5)
    shape = (1, 24, 24, 24)
    truth = np.full(shape, 100.0, dtype=np.float32)
    x = np.linspace(-1, 1, 24)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    bias = np.exp(0.4 * gx - 0.3 * gy + 0.2 * gz)[None]
    corrupted = (truth * bias).astype(np.float32)
    corrected = M.bias_correct(
        Volume(data=corrupted),
        mask=Volume(data=np.ones(shape, np.uint8)),
        shrink_factor=2,
        num_fitting_levels=3,
        num_iterations=30,
        field_fit="bspline",
    )
    out = corrected.numpy()
    cv_before = corrupted.std() / corrupted.mean()
    cv_after = out.std() / out.mean()
    assert cv_after < cv_before * 0.2, (cv_before, cv_after)
