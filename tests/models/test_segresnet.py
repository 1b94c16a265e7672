"""SegResNet: shapes, gradients, trainer integration, checkpoint round-trip.

The architecture is a capability extension beyond the reference's single
MONAI UNet (reference: src/segmantic/seg/monai_unet.py:105-124); selected
via ``train(arch="segresnet")``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.models import SegResNet


@pytest.mark.parametrize("nd,sp", [(3, 16), (2, 32)])
def test_forward_shape(nd, sp):
    model = SegResNet(spatial_dims=nd, in_channels=2, out_channels=5,
                      init_filters=4, blocks_down=(1, 2, 2),
                      blocks_up=(1, 1))
    x = jnp.zeros((2,) + (sp,) * nd + (2,))
    variables = model.init(jax.random.key(0), x, training=False)
    y = model.apply(variables, x, training=False)
    assert y.shape == (2,) + (sp,) * nd + (5,)


def test_gradients_flow_and_determinism():
    model = SegResNet(spatial_dims=3, in_channels=1, out_channels=3,
                      init_filters=4, blocks_down=(1, 1), blocks_up=(1,))
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, training=False)

    def loss(params):
        y = model.apply({"params": params}, x, training=False)
        return (y ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    y1 = model.apply(variables, x, training=False)
    y2 = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_phase_logits_rejected():
    model = SegResNet(spatial_dims=3, init_filters=4,
                      blocks_down=(1, 1), blocks_up=(1,))
    assert model.phase_top_ok() is False
    x = jnp.zeros((1, 8, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, training=False)
    with pytest.raises(ValueError, match="phase-logits"):
        model.apply(variables, x, training=False, phase_logits=True)


def test_train_and_checkpoint_roundtrip(tmp_path):
    """End-to-end: train(arch='segresnet') on a tiny synthetic task, then
    SegmentationModel.load restores the exact model from the checkpoint."""
    from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
    from segmantic_tpu.io.nifti import write_volume
    from segmantic_tpu.train.trainer import SegmentationModel, train

    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    (tmp_path / "image").mkdir()
    (tmp_path / "label").mkdir()
    for i in range(3):
        lbl = np.zeros((16, 16, 16), np.uint8)
        lbl[4:12, 4:12, 4:12] = 1
        img = lbl * 2.0 + rng.normal(0, 0.2, lbl.shape)
        write_volume(tmp_path / "image" / f"c{i}.nii.gz",
                     Volume(data=img.astype(np.float32)[None], affine=aff))
        write_volume(tmp_path / "label" / f"c{i}.nii.gz",
                     Volume(data=lbl[None], affine=aff.copy()))

    result = train(
        image_dir=tmp_path / "image",
        labels_dir=tmp_path / "label",
        output_dir=tmp_path / "run",
        num_classes=2,
        spatial_dims=3,
        spatial_size=(16, 16, 16),
        arch="segresnet",
        arch_params={"init_filters": 4, "blocks_down": [1, 1],
                     "blocks_up": [1]},
        max_epochs=2,
        batch_size=1,
        num_samples=2,
        mixed_precision=False,
        val_roi_size=(16, 16, 16),
        seed=0,
    )
    assert result.best_checkpoint is not None
    assert np.isfinite(result.best_val_dice)

    restored = SegmentationModel.load(result.best_checkpoint)
    assert restored.hparams["arch"] == "segresnet"
    assert type(restored.module).__name__ == "SegResNet"
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)), jnp.float32)
    a = result.model.module.apply(result.model.variables, x, training=False)
    b = restored.module.apply(restored.variables, x, training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
