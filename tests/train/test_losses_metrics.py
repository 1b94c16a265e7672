import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.metrics.distance import (
    hausdorff_pointwise_distance,
    hausdorff_surface_distance,
)
from segmantic_tpu.metrics.overlap import (
    confusion_matrix,
    confusion_matrix_metrics,
    dice_from_confusion,
    dice_metric,
)
from segmantic_tpu.train.losses import dice_ce_loss, dice_loss


def test_dice_loss_perfect_prediction():
    labels = jnp.array([[[0, 1], [1, 0]]])  # (1, 2, 2)
    logits = jax.nn.one_hot(labels, 2) * 20.0  # near-certain
    loss = dice_loss(logits, labels)
    assert float(loss) < 1e-3


def test_dice_loss_worst_prediction():
    labels = jnp.zeros((1, 2, 2), jnp.int32)
    logits = jnp.stack([jnp.full((1, 2, 2), -20.0), jnp.full((1, 2, 2), 20.0)], axis=-1)
    loss = dice_loss(logits, labels)
    assert float(loss) > 0.9


def test_dice_loss_gradient_finite():
    labels = jnp.array([[[0, 1], [1, 2]]])
    logits = jnp.zeros((1, 2, 2, 3))
    g = jax.grad(lambda l: dice_loss(l, labels))(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(dice_ce_loss(logits, labels)) > 0


def test_confusion_matrix_identity_diag():
    y = np.array([0, 0, 1, 1, 1, 2])
    cm = confusion_matrix(3, y, y)
    np.testing.assert_array_equal(np.diag(cm), np.bincount(y))
    assert cm.sum() == len(y)
    np.testing.assert_array_equal(np.diag(np.asarray(cm), 1), 0)


def test_confusion_matrix_jax_np_agree():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 1000)
    p = rng.integers(0, 4, 1000)
    np.testing.assert_array_equal(
        confusion_matrix(4, t, p), np.asarray(confusion_matrix(4, jnp.asarray(t), jnp.asarray(p)))
    )


def test_dice_metric_and_cm_metrics():
    t = np.zeros((8, 8), np.int64)
    t[2:6, 2:6] = 1
    p = np.zeros((8, 8), np.int64)
    p[2:6, 2:5] = 1
    d = float(dice_metric(jnp.asarray(p), jnp.asarray(t), 2))
    # dice = 2*12/(12+16)
    assert d == pytest.approx(2 * 12 / 28, abs=1e-5)
    m = confusion_matrix_metrics(confusion_matrix(2, t, p))
    assert m["sensitivity"][1] == pytest.approx(12 / 16)
    assert m["precision"][1] == pytest.approx(1.0)
    np.testing.assert_allclose(
        dice_from_confusion(confusion_matrix(2, t, p))[1], 2 * 12 / 28
    )


def test_hausdorff_self_distance_zero():
    mask = np.zeros((10, 10), np.uint8)
    mask[3:6, 3:6] = 1
    r = hausdorff_surface_distance(mask, mask)
    assert all(v == 0.0 for v in r.values())
    r = hausdorff_pointwise_distance(mask, mask)
    assert all(v == 0.0 for v in r.values())


def test_hausdorff_grows_with_dilation():
    a = np.zeros((10, 10), np.uint8)
    a[3:6, 3:6] = 1
    b = np.zeros((10, 10), np.uint8)
    b[1:8, 2:7] = 1
    r = hausdorff_surface_distance(a, b)
    assert r["max"] >= 2.0
    assert all(v > 0.0 for v in r.values())


def test_hausdorff_respects_spacing():
    a = np.zeros((10, 10), np.uint8)
    a[4, 4] = 1
    b = np.zeros((10, 10), np.uint8)
    b[4, 6] = 1
    r1 = hausdorff_surface_distance(a, b, spacing=(1.0, 1.0))
    r2 = hausdorff_surface_distance(a, b, spacing=(1.0, 2.5))
    assert r1["max"] == pytest.approx(2.0)
    assert r2["max"] == pytest.approx(5.0)


def test_dice_custom_vjp_matches_autodiff():
    """The analytic dice gradient (custom VJP, production int-label path)
    must match plain autodiff of the reference formulation."""
    import numpy as np

    from segmantic_tpu.train.losses import _dice_reference

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 4)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (2, 6, 6, 6)), jnp.int32)

    for include_bg in (True, False):
        ref = _dice_reference(
            logits, labels, include_background=include_bg,
            smooth_nr=1e-5, smooth_dr=1e-5, apply_softmax=True,
        )
        fast = dice_loss(logits, labels, include_background=include_bg)
        np.testing.assert_allclose(float(fast), float(ref), rtol=1e-6)

        g_ref = jax.grad(
            lambda l: _dice_reference(
                l, labels, include_background=include_bg,
                smooth_nr=1e-5, smooth_dr=1e-5, apply_softmax=True,
            )
        )(logits)
        g_fast = jax.grad(
            lambda l: dice_loss(l, labels, include_background=include_bg)
        )(logits)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_ref), rtol=1e-5, atol=1e-8
        )


def test_dice_custom_vjp_bf16_and_jit():
    import numpy as np

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 3, (1, 8, 8)), jnp.int32)
    v, g = jax.jit(jax.value_and_grad(lambda l: dice_loss(l, labels)))(logits)
    assert np.isfinite(float(v))
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_dice_phase_mm_matches_reference():
    """The matmul-segmented phase dice (production phase-major path) must
    match the reshape-and-delegate reference in value and gradient, for 3D
    and 2D phase groups and with/without background."""
    from segmantic_tpu.train.losses import dice_loss_phase

    rng = np.random.default_rng(11)
    for nd, num_classes in ((3, 5), (2, 3)):
        n_phase = 2**nd
        spatial = (6,) * nd
        xp = jnp.asarray(
            rng.standard_normal((2, *spatial, n_phase * num_classes)) * 4,
            jnp.float32,
        )
        yp = jnp.asarray(
            rng.integers(0, num_classes, (2, *spatial, n_phase)), jnp.int32
        )

        def ref_fn(a, include_bg):
            view = a.reshape(a.shape[:-1] + (n_phase, num_classes))
            from segmantic_tpu.train.losses import _dice_reference

            return _dice_reference(
                view, yp, include_background=include_bg,
                smooth_nr=1e-5, smooth_dr=1e-5, apply_softmax=True,
            )

        for include_bg in (True, False):
            ref = ref_fn(xp, include_bg)
            got = dice_loss_phase(xp, yp, include_background=include_bg)
            np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

            g_ref = jax.grad(lambda a: ref_fn(a, include_bg))(xp)
            g_got = jax.grad(
                lambda a: dice_loss_phase(a, yp, include_background=include_bg)
            )(xp)
            scale = float(jnp.max(jnp.abs(g_ref)))
            np.testing.assert_allclose(
                np.asarray(g_got), np.asarray(g_ref), atol=2e-4 * scale
            )


def test_dice_phase_mm_bf16_jit():
    from segmantic_tpu.train.losses import dice_loss_phase

    rng = np.random.default_rng(12)
    xp = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 8 * 3)), jnp.bfloat16)
    yp = jnp.asarray(rng.integers(0, 3, (1, 4, 4, 4, 8)), jnp.int32)
    v, g = jax.jit(
        jax.value_and_grad(lambda a: dice_loss_phase(a, yp))
    )(xp)
    assert np.isfinite(float(v))
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_dice_phase_mm_bf16_bwd_close_to_f32():
    """The bf16-intermediate backward (engaged for bf16 logits) stays
    within bf16 granularity of the f32-path gradient."""
    from segmantic_tpu.train.losses import dice_loss_phase

    rng = np.random.default_rng(13)
    xp = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 8 * 4)) * 3, jnp.float32)
    yp = jnp.asarray(rng.integers(0, 4, (2, 6, 6, 6, 8)), jnp.int32)
    g32 = jax.grad(lambda a: dice_loss_phase(a, yp))(xp)
    g16 = jax.grad(lambda a: dice_loss_phase(a, yp))(xp.astype(jnp.bfloat16))
    scale = float(jnp.max(jnp.abs(g32)))
    err = float(jnp.max(jnp.abs(g16.astype(jnp.float32) - g32)))
    # the comparison includes the logits' own bf16 quantization, so the
    # bound is a few bf16 ulps of the gradient scale
    assert err < 0.06 * scale, (err, scale)


def test_dice_phase_mm_sample_shift_exact():
    """SEGMANTIC_DICE_MAX=sample (one softmax shift scalar per sample)
    must match the default per-group shift in value and gradient — the
    shift cancels exactly for any per-group-constant m
    (losses.py::_dice_phase_fwd; A/B exp/dice_max_ab.py)."""
    import os

    from segmantic_tpu.train.losses import dice_loss_phase

    rng = np.random.default_rng(17)
    xp = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 8 * 4)) * 5, jnp.float32)
    yp = jnp.asarray(rng.integers(0, 4, (2, 6, 6, 6, 8)), jnp.int32)
    assert os.environ.get("SEGMANTIC_DICE_MAX", "group") == "group"
    v0, g0 = jax.value_and_grad(lambda a: dice_loss_phase(a, yp))(xp)
    os.environ["SEGMANTIC_DICE_MAX"] = "sample"
    try:
        v1, g1 = jax.value_and_grad(lambda a: dice_loss_phase(a, yp))(xp)
    finally:
        del os.environ["SEGMANTIC_DICE_MAX"]
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    scale = float(jnp.max(jnp.abs(g0)))
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), atol=1e-5 * scale
    )
