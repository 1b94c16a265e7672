"""fp8 wire quantization bound (r3 VERDICT #6).

``wire_dtype=float8_e4m3fn`` halves the bf16 wire again for slow links but
is LOSSY (~4% relative input quantization for z-scored intensities). This
test bounds its segmentation impact on a trained model: sliding-window
argmax agreement and per-class Dice vs the exact f32 wire. The safe-use
envelope is documented next to ``wire_dtype``
(infer/sliding_window.py) and in the README Status table.

reference hot loop: src/segmantic/seg/monai_unet.py:637-639.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmantic_tpu.infer.sliding_window import sliding_window_inference
from segmantic_tpu.models.unet import UNet
from segmantic_tpu.train.losses import dice_ce_loss
from segmantic_tpu.train.optim import make_optimizer


def _phantom(shape, rng):
    g = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                    indexing="ij")
    )
    c = (np.asarray(shape, np.float32) - 1)[:, None, None, None] / 2
    r2 = (((g - c) / (np.asarray(shape)[:, None, None, None] / 3)) ** 2).sum(0)
    lbl = (r2 < 1.0).astype(np.int32)
    img = lbl * 2.0 + rng.normal(0, 0.25, shape)
    return img.astype(np.float32), lbl


@pytest.fixture(scope="module")
def trained_model():
    """A small UNet overfit on one phantom batch — confident logits, the
    regime where the fp8 envelope claim must hold."""
    rng = np.random.default_rng(3)
    imgs, lbls = [], []
    for _ in range(4):
        img, lbl = _phantom((16, 16, 16), rng)
        imgs.append(img)
        lbls.append(lbl)
    x = jnp.asarray(np.stack(imgs))[..., None]
    y = jnp.asarray(np.stack(lbls))

    model = UNet(spatial_dims=3, in_channels=1, out_channels=2,
                 channels=(4, 8), strides=(2,), num_res_units=1)
    variables = model.init(jax.random.key(0), x, training=False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    opt = make_optimizer({"optimizer": "Adam", "lr": 3e-3})
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, training=True,
                mutable=["batch_stats"],
            )
            return dice_ce_loss(logits, y), upd["batch_stats"]

        (loss, new_bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), new_bstats, opt_state, loss

    for _ in range(60):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
    assert float(loss) < 0.4, float(loss)
    return model, params, bstats


def test_fp8_wire_argmax_and_dice_bound(trained_model):
    model, params, bstats = trained_model

    def predictor(windows):
        return model.apply(
            {"params": params, "batch_stats": bstats},
            windows.astype(jnp.bfloat16), training=False,
        ).astype(jnp.float32)

    rng = np.random.default_rng(9)
    img, lbl = _phantom((24, 22, 20), rng)
    vol = img[..., None]
    kw = dict(roi_size=(16, 16, 16), sw_batch_size=4, predictor=predictor,
              overlap=0.25, num_classes=2)

    seg = {}
    for name, wire in (("f32", None), ("bf16", jnp.bfloat16),
                       ("fp8", jnp.float8_e4m3fn)):
        logits = np.asarray(sliding_window_inference(
            vol, wire_dtype=wire, upload_pipeline=(wire is not None), **kw))
        seg[name] = logits.argmax(-1)

    # bf16 wire: the bf16 model reads bf16 windows either way -> argmax
    # essentially unmoved (boundary ties only)
    assert (seg["bf16"] == seg["f32"]).mean() > 0.995

    # fp8 wire: measured envelope — argmax agreement and Dice delta vs f32
    agree = (seg["fp8"] == seg["f32"]).mean()
    assert agree > 0.97, agree

    def dice(a, b, cls):
        inter = ((a == cls) & (b == cls)).sum()
        return 2 * inter / max((a == cls).sum() + (b == cls).sum(), 1)

    for cls in (0, 1):
        d = dice(seg["fp8"], seg["f32"], cls)
        assert d > 0.95, (cls, d)

    # and the fp8 segmentation still solves the task vs ground truth
    assert dice(seg["fp8"], lbl, 1) > 0.8
