"""Overfit bisect for the head-to-head gap (exp/headtohead_torch.py): can
each stack drive ONE fixed 8-patch batch to ~zero dice loss?

Isolates model + loss + optimizer from the sampler/trainer/augment:
- jax side: UNet.apply + train.losses.dice_loss + optax adam, no
  augment_batch, no trainer;
- torch side: the twin model + per-sample dice + torch Adam.

Run: python exp/overfit_probe.py [ITERS]  (CPU; needs /tmp/h2h from
     `python exp/headtohead_torch.py gen /tmp/h2h`)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SEGMANTIC_FORCE_PLATFORM", "cpu")

import numpy as np

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 150
PATCH = 32
NUM_CLASSES = 3


def fixed_batch():
    import json

    from exp.headtohead_torch import run_torch  # noqa: F401  (same loaders)
    from segmantic_tpu.io.nifti import read_volume

    rng = np.random.default_rng(0)
    datalist = json.loads(Path("/tmp/h2h/datalist.json").read_text())
    imgs, lbls = [], []
    for case in datalist["training"][:2]:
        img = read_volume(case["image"]).data[0].astype(np.float32)
        lbl = read_volume(case["label"]).data[0].astype(np.int64)
        img = (img - img.mean()) / max(img.std(), 1e-8)
        idx = np.argwhere(lbl > 0)
        lo, hi = idx.min(0), idx.max(0) + 1
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        img, lbl = img[sl], lbl[sl]
        pad = [(0, max(0, PATCH - s)) for s in img.shape]
        img, lbl = np.pad(img, pad), np.pad(lbl, pad)
        for _ in range(4):
            classes = [c for c in np.unique(lbl) if c > 0]
            locs = np.argwhere(lbl == classes[rng.integers(len(classes))])
            c = locs[rng.integers(len(locs))]
            start = [int(np.clip(x - PATCH // 2, 0, s - PATCH))
                     for x, s in zip(c, img.shape)]
            w = tuple(slice(a, a + PATCH) for a in start)
            imgs.append(img[w])
            lbls.append(lbl[w])
    return np.stack(imgs), np.stack(lbls)


def run_jax(x, y):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.losses import dice_loss

    model = UNet(spatial_dims=3, in_channels=1, out_channels=NUM_CLASSES,
                 channels=(16, 32, 64), strides=(2, 2), num_res_units=2)
    xj = jnp.asarray(x)[..., None]
    yj = jnp.asarray(y.astype(np.int32))
    variables = model.init(jax.random.key(0), xj[:1], training=False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, xj, training=True,
                mutable=["batch_stats"])
            return dice_loss(out, yj), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    curve = []
    for i in range(ITERS):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        if i % 10 == 0 or i == ITERS - 1:
            curve.append(round(float(loss), 4))
    print(f"JAX_OVERFIT curve={curve}", flush=True)


def run_torch(x, y):
    import torch

    from exp.headtohead_torch import _torch_model

    torch.manual_seed(0)
    import torch.nn.functional as F

    model = _torch_model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    xt = torch.from_numpy(x[:, None])
    yt = torch.from_numpy(y)
    curve = []
    for i in range(ITERS):
        opt.zero_grad()
        probs = torch.softmax(model(xt), dim=1)
        onehot = F.one_hot(yt, NUM_CLASSES).permute(0, 4, 1, 2, 3).float()
        inter = (probs * onehot).sum((2, 3, 4))
        denom = probs.sum((2, 3, 4)) + onehot.sum((2, 3, 4))
        loss = (1.0 - (2 * inter + 1e-5) / (denom + 1e-5)).mean()
        loss.backward()
        opt.step()
        if i % 10 == 0 or i == ITERS - 1:
            curve.append(round(float(loss), 4))
    print(f"TORCH_OVERFIT curve={curve}", flush=True)


if __name__ == "__main__":
    x, y = fixed_batch()
    mode = os.environ.get("OVERFIT_SIDE", "both")
    if mode in ("both", "torch"):
        run_torch(x, y)
    if mode in ("both", "jax"):
        run_jax(x, y)
