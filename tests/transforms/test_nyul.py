import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume
from segmantic_tpu.transforms.intensity import NyulNormalize, interp1d


def test_interp1d_golden_values():
    # golden values from the reference's custom interp1d test
    # (reference: tests/seg/test_normalize.py:8-28)
    xp = np.array([0.0, 4, 6, 10])
    fp = np.array([1.0, -1, 3, 5])
    yi = interp1d(np.array([0.0, 2, 4, 8, 10]), xp, fp)
    np.testing.assert_allclose(yi, [1.0, 0.0, -1.0, 4.0, 5.0], atol=1e-3)
    # extrapolation beyond both ends
    yi = interp1d(np.array([-1.0, 11]), xp, fp)
    np.testing.assert_allclose(yi, [1.5, 5.5], atol=1e-3)
    # 2D input keeps shape
    yi = interp1d(np.array([[-2.0, 11], [1, 3], [8, 10]]), xp, fp)
    assert yi.shape == (3, 2)
    np.testing.assert_allclose(yi, [[2.0, 5.5], [0.5, -0.5], [4.0, 5.0]], atol=1e-3)


def test_nyul_standardizes_two_scans():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, 16, 16, 16)).astype(np.float32)
    a = Volume(data=(base * 100).astype(np.float32))
    b = Volume(data=(base * 37 + 5).astype(np.float32))  # same anatomy, diff scale

    t = NyulNormalize(keys="image", quantiles=np.linspace(0.01, 0.99, 7))
    t.fit([a, b])
    out_a = t({"image": a})["image"].numpy()
    out_b = t({"image": b})["image"].numpy()
    # after standardization the two scans should be nearly identical
    np.testing.assert_allclose(out_a, out_b, atol=1.0)


def test_nyul_requires_fit_or_scale():
    t = NyulNormalize(keys="image")
    with pytest.raises(RuntimeError):
        t({"image": Volume(data=np.ones((1, 4, 4, 4), np.float32))})


def test_nyul_device_path_matches_host():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    data = rng.uniform(0, 80, (12, 12, 12)).astype(np.float32)
    data[:3] = 0.0  # exercise the nonzero-mask branch

    for nonzero in (False, True):
        t = NyulNormalize(
            keys="image", quantiles=np.linspace(0.01, 0.99, 9), nonzero_mask=nonzero
        )
        t.fit([Volume(data=data[None])])
        host = t._normalize_array(data)
        dev = np.asarray(jax.jit(t.normalize_device)(jnp.asarray(data)))
        np.testing.assert_allclose(dev, host, atol=1e-2)


def test_nyul_with_provided_scale():
    t = NyulNormalize(
        keys="image",
        quantiles=[0.1, 0.5, 0.9],
        standard_scale=[0.0, 50.0, 100.0],
    )
    img = Volume(
        data=np.random.default_rng(1).uniform(0, 10, (1, 8, 8, 8)).astype(np.float32)
    )
    out = t({"image": img})["image"].numpy()
    assert np.quantile(out, 0.5) == pytest.approx(50.0, abs=2.0)
