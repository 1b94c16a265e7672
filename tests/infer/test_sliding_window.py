import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.infer.sliding_window import (
    SlidingWindowInferer,
    gaussian_importance,
    sliding_window_inference,
    window_starts,
)


def test_window_starts_cover_volume():
    starts = window_starts((100, 80), (32, 32), overlap=0.25)
    ends0 = sorted({s[0] + 32 for s in starts})
    ends1 = sorted({s[1] + 32 for s in starts})
    assert ends0[-1] == 100
    assert ends1[-1] == 80
    assert min(s[0] for s in starts) == 0
    # stride 24 along both axes
    xs = sorted({s[0] for s in starts})
    assert xs == [0, 24, 48, 68]


def test_window_starts_roi_bigger_than_volume():
    assert window_starts((10, 10), (32, 32), 0.25) == [(0, 0)]


def test_gaussian_importance_peak_center():
    w = gaussian_importance((9, 9))
    assert w.argmax() == 9 * 4 + 4
    assert w.min() > 0


@pytest.mark.parametrize("mode", ["gaussian", "constant"])
def test_identity_predictor_blend(mode):
    # predictor that returns the window content itself: blending must
    # reconstruct the volume exactly regardless of overlap
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((40, 33, 1)).astype(np.float32)

    def predictor(windows):
        return windows

    out = sliding_window_inference(
        vol, (16, 16), 3, predictor, overlap=0.25, mode=mode
    )
    np.testing.assert_allclose(np.asarray(out)[..., 0], vol[..., 0], atol=1e-3)


def test_small_volume_padding():
    vol = np.ones((5, 6, 1), np.float32)

    def predictor(windows):
        return jnp.concatenate([windows, windows * 2], axis=-1)

    out = sliding_window_inference(vol, (8, 8), 2, predictor)
    assert out.shape == (5, 6, 2)
    np.testing.assert_allclose(np.asarray(out)[..., 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[..., 1], 2.0, atol=1e-4)


def test_3d_inference_shape():
    vol = np.zeros((20, 18, 17, 2), np.float32)

    def predictor(windows):
        return windows[..., :1] * 0 + 1.0

    inferer = SlidingWindowInferer(roi_size=(8, 8, 8), sw_batch_size=4, overlap=0.5)
    out = inferer(vol, predictor)
    assert out.shape == (20, 18, 17, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)


def test_mesh_sharded_windows_match_single_device():
    """Window batches sharded over the mesh produce identical blended output
    (spatial context parallelism — windows are independent)."""
    from segmantic_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    vol = rng.standard_normal((40, 36, 1)).astype(np.float32)

    @jax.jit
    def predictor(w):
        return jnp.concatenate([w * 2.0, -w], axis=-1)

    base = sliding_window_inference(vol, (16, 16), 8, predictor, overlap=0.25)
    mesh = make_mesh()
    sharded = sliding_window_inference(
        vol, (16, 16), 8, predictor, overlap=0.25, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(sharded), atol=1e-5)


def test_mesh_rounds_sw_batch_to_devices():
    from segmantic_tpu.parallel.mesh import make_mesh

    vol = np.ones((20, 20, 1), np.float32)

    @jax.jit
    def predictor(w):
        return w

    mesh = make_mesh()
    out = sliding_window_inference(vol, (8, 8), 3, predictor, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out)[..., 0], 1.0, atol=1e-5)


def test_scanned_chunks_match_python_loop():
    """The jitted-scan chunk executor must be bit-identical to the
    per-chunk Python loop (same grid, same blend)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    vol = rng.standard_normal((50, 44, 38, 1)).astype(np.float32)

    def predictor(w):
        return jnp.concatenate([w * 2.0, -w], axis=-1)

    a = sliding_window_inference(
        vol, (16, 16, 16), 3, predictor, overlap=0.25, scan_chunks=True
    )
    b = sliding_window_inference(
        vol, (16, 16, 16), 3, predictor, overlap=0.25, scan_chunks=False
    )
    assert jnp.array_equal(a, b)


def test_streamed_matches_device_path():
    """Host-streamed inference (for volumes beyond HBM) must match the
    on-device path on the same grid/blend."""
    from segmantic_tpu.infer.sliding_window import (
        sliding_window_inference_streamed,
    )

    rng = np.random.default_rng(5)
    vol = rng.standard_normal((40, 36, 30, 1)).astype(np.float32)

    def predictor(w):
        return jnp.concatenate([w * 3.0, w * -0.5], axis=-1)

    dev = np.asarray(
        sliding_window_inference(vol, (16, 16, 16), 4, predictor, overlap=0.25)
    )
    host = sliding_window_inference_streamed(
        vol, (16, 16, 16), 4, predictor, overlap=0.25
    )
    np.testing.assert_allclose(host, dev, atol=1e-4)


def test_streamed_small_volume_padding():
    from segmantic_tpu.infer.sliding_window import (
        sliding_window_inference_streamed,
    )

    vol = np.random.default_rng(6).standard_normal((10, 9, 8, 1)).astype(np.float32)
    out = sliding_window_inference_streamed(
        vol, (16, 16, 16), 2, lambda w: w, overlap=0.25
    )
    assert out.shape == (10, 9, 8, 1)


def test_volume_sharded_matches_single_device():
    """shard_volume=True: slabs + halo exchange over the mesh reproduce the
    single-device blend (up to fp summation order)."""
    from segmantic_tpu.infer.sliding_window import (
        sliding_window_inference_sharded,
    )
    from segmantic_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    vol = rng.standard_normal((40, 24, 24, 1)).astype(np.float32)

    @jax.jit
    def predictor(w):
        # spatially asymmetric map so slab/halo indexing bugs show up
        ramp = jnp.arange(w.shape[1], dtype=jnp.float32)[None, :, None, None, None]
        return jnp.concatenate([w * 2.0 + ramp * 0.01, -w], axis=-1)

    base = sliding_window_inference(
        vol, (16, 16, 16), 4, predictor, overlap=0.25
    )
    mesh = make_mesh(data=4)
    sharded = sliding_window_inference_sharded(
        vol, (16, 16, 16), 4, predictor, mesh, overlap=0.25
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(sharded), atol=1e-4, rtol=1e-4
    )


def test_volume_sharded_routing_and_thin_slab_fallback():
    """The shard_volume flag routes to the sharded path when slabs fit the
    roi and falls back to window sharding when they don't."""
    from segmantic_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(12)
    vol = rng.standard_normal((40, 24, 24, 1)).astype(np.float32)

    @jax.jit
    def predictor(w):
        return jnp.concatenate([w, -w], axis=-1)

    base = sliding_window_inference(
        vol, (16, 16, 16), 4, predictor, overlap=0.25
    )
    # 8-way mesh -> slab 5 < roi 16: falls back, still correct
    mesh8 = make_mesh()
    out8 = sliding_window_inference(
        vol, (16, 16, 16), 4, predictor, overlap=0.25, mesh=mesh8,
        shard_volume=True,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out8), atol=1e-4)
    # 2-way mesh -> slab 20 >= roi: sharded path
    mesh2 = make_mesh(data=2)
    out2 = sliding_window_inference(
        vol, (16, 16, 16), 4, predictor, overlap=0.25, mesh=mesh2,
        shard_volume=True,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2), atol=1e-4)
