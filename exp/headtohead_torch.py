"""Same-data head-to-head: this repo's train() vs a torch re-implementation
of the reference's training stack (VERDICT r2 "missing #1", best-effort).

The actual reference (MONAI + Lightning) cannot run here — zero-egress
container, no MONAI/SimpleITK wheel baked in (documented in BASELINE.md).
torch IS baked in, so this harness trains a from-scratch torch twin of the
reference's model and protocol on the identical dataset and split:

- model: the MONAI residual-UNet topology the reference wraps
  (reference: src/segmantic/seg/monai_unet.py:105-124) — stride-2 residual
  encoder (num_res_units sub-convs + projection shortcut), transposed-conv
  decoder with skip concatenation, BatchNorm(eps 1e-5) + single-alpha
  PReLU, final stage conv-only;
- loss: soft Dice, softmax + one-hot, include_background, smooth 1e-5
  (reference: monai_unet.py:128);
- data protocol: per-volume z-score, crop-foreground from the label,
  class-balanced random 32^3 patches (num_samples per volume, background
  ratio 0; reference: monai_unet.py:151-203), per-axis random flips
  (p=0.2), Adam;
- val: whole-volume forward (64^3 volumes => the sliding window is a
  single window), argmax, per-class Dice from the confusion matrix,
  background excluded, present-class mean — the same reduction as
  segmantic_tpu.train.trainer.validate (reference: monai_unet.py:350-397).

Both sides read the same NIfTI files and the same explicit
training/validation datalist; each runs its own stack end to end.

Run:  python exp/headtohead_torch.py            # gen + both sides + summary
      python exp/headtohead_torch.py jax DIR    # one side, for debugging
      python exp/headtohead_torch.py torch DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SEGMANTIC_FORCE_PLATFORM", "cpu")

import numpy as np

EPOCHS = int(os.environ.get("H2H_EPOCHS", "25"))
PATCH = 32
NUM_CLASSES = 3
CHANNELS = (16, 32, 64)
STRIDES = (2, 2)
LR = 1e-3
BATCH_VOLS = 2
NUM_SAMPLES = 4
FLIP_P = 0.2
# H2H_AUG=1 turns on SPATIAL augmentation both sides: the repo's fused
# on-device shear-matmul rotation+zoom vs reference-style whole-volume
# rotation/zoom (scipy affine, rotate-then-crop order like MONAI
# RandRotated/RandZoomd; reference: monai_unet.py:181-191)
AUG = os.environ.get("H2H_AUG", "") == "1"
ROT_P, ROT_RANGE = 0.2, 0.4
ZOOM_P, ZOOM_RANGE = 0.2, (0.8, 1.3)
# H2H_GEO=1 runs the head-to-head on REALISTIC geometry: 6-class phantoms
# (5 foreground structures defined in physical mm) on per-case anisotropic
# (1.1, 1.3, 2.6 mm), rotated, negative-determinant grids — so orientation,
# spacing resample, patch sampling AND the inversion back to the original
# grid are all inside the Dice comparison (reference pipeline under test:
# monai_unet.py:151-176 preprocessing + :595-625 Invertd). Both stacks
# train at 1.2 mm isotropic; each side also reports ORIG-space Dice from
# its own inverse (repo: infer.predict.segment_volume's Invertd; twin:
# scipy resample of the logits back onto the stored grid).
GEO = os.environ.get("H2H_GEO", "") == "1"
if GEO:
    NUM_CLASSES = 6
SPACING_PRE = (1.2, 1.2, 1.2)


# ---------------------------------------------------------------- dataset
def geo_affine(rng) -> np.ndarray:
    """Per-case anisotropic, rotated, NEGATIVE-determinant affine."""
    from segmantic_tpu.core.volume import affine_from_spacing_origin

    spacing = (1.1, 1.3, 2.6)
    tz = rng.uniform(-0.35, 0.35)
    cz, sz = np.cos(tz), np.sin(tz)
    rot = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    tx = rng.uniform(-0.3, 0.3)
    cx, sx = np.cos(tx), np.sin(tx)
    rot = rot @ np.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    direction = rot @ np.diag([1.0, 1.0, -1.0])  # det < 0 (LPS-style flip)
    origin = tuple(rng.uniform(-40.0, 40.0, 3))
    return affine_from_spacing_origin(spacing, origin, direction)


def synth_case_geo(rng, shape, affine):
    """6-class phantom: 5 foreground structures defined in PHYSICAL mm
    (ellipsoid, box, small ellipsoid, spherical shell, cylinder) evaluated
    on the stored grid through its affine — nothing is axis-aligned in
    index space, so correct orientation/spacing handling is load-bearing."""
    idx = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shape],
                    indexing="ij"), -1)
    p = idx @ affine[:3, :3].T + affine[:3, 3]
    lbl = np.zeros(shape, np.uint8)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    span = hi - lo

    def center():
        return lo + rng.uniform(0.3, 0.7, 3) * span

    c, r = center(), rng.uniform(10, 15, 3)
    lbl[(((p - c) / r) ** 2).sum(-1) < 1.0] = 1
    c, h = center(), rng.uniform(6, 10, 3)
    lbl[np.all(np.abs(p - c) < h, -1)] = 2
    c, r = center(), rng.uniform(5, 8, 3)
    lbl[(((p - c) / r) ** 2).sum(-1) < 1.0] = 3
    c, r0 = center(), rng.uniform(9, 13)
    d2 = ((p - c) ** 2).sum(-1)
    lbl[(d2 < r0 ** 2) & (d2 > (r0 - 4.0) ** 2)] = 4
    c, ax, rr = center(), int(rng.integers(3)), rng.uniform(4.5, 7.0)
    others = [d for d in range(3) if d != ax]
    d2 = sum((p[..., o] - c[o]) ** 2 for o in others)
    lbl[(d2 < rr ** 2) & (np.abs(p[..., ax] - c[ax]) < rng.uniform(9, 15))] = 5
    levels = np.array([0.0, 1.5, -1.5, 2.5, -2.5, 0.8], np.float32)
    img = levels[lbl] + rng.normal(0, 0.3, shape)
    return img.astype(np.float32), lbl


def gen_dataset(root: Path) -> Path:
    from exp.train_quality import synth_case
    from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
    from segmantic_tpu.io.nifti import write_volume

    rng = np.random.default_rng(0)
    (root / "image").mkdir(parents=True)
    (root / "label").mkdir()
    cases = []
    for i in range(8):
        if GEO:
            aff = geo_affine(rng)
            img, lbl = synth_case_geo(rng, (64, 56, 28), aff)
        else:
            aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
            img, lbl = synth_case(rng)
        write_volume(root / "image" / f"c{i}.nii.gz",
                     Volume(data=img[None], affine=aff))
        write_volume(root / "label" / f"c{i}.nii.gz",
                     Volume(data=lbl[None], affine=aff.copy()))
        cases.append({"image": str(root / "image" / f"c{i}.nii.gz"),
                      "label": str(root / "label" / f"c{i}.nii.gz")})
    datalist = {"training": cases[:6], "validation": cases[6:]}
    (root / "datalist.json").write_text(json.dumps(datalist, indent=2))
    return root / "datalist.json"


def present_class_dice(pred: np.ndarray, lbl: np.ndarray) -> float:
    """Background-excluded present-class mean Dice (the validate() reduction)."""
    per = []
    for c in range(1, NUM_CLASSES):
        if (lbl == c).any() or (pred == c).any():
            tp = ((pred == c) & (lbl == c)).sum()
            per.append(2 * tp / ((pred == c).sum() + (lbl == c).sum()))
    return float(np.mean(per)) if per else float("nan")


# ---------------------------------------------------------------- jax side
def run_jax(root: Path) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from segmantic_tpu.train.trainer import train

    result = train(
        datalist=root / "datalist.json",
        output_dir=root / "run_jax",
        num_classes=NUM_CLASSES,
        spatial_dims=3,
        spatial_size=(PATCH,) * 3,
        channels=CHANNELS,
        strides=STRIDES,
        max_epochs=EPOCHS,
        batch_size=BATCH_VOLS,
        num_samples=NUM_SAMPLES,
        mixed_precision=False,
        augment_spatial=AUG,
        augment_intensity=False,
        optimizer={"optimizer": "Adam", "lr": LR},
        val_roi_size=(64, 64, 64),
        spacing=SPACING_PRE if GEO else (),
        seed=0,
    )
    curve = [h["val_dice"] for h in result.history if "val_dice" in h]
    print(f"JAX_RESULT best={result.best_val_dice:.4f} "
          f"epoch={result.best_val_epoch} curve={np.round(curve, 4).tolist()}",
          flush=True)
    if GEO:
        # ORIG-space Dice via the production inversion path: sliding window
        # on the preprocessed grid, Invertd (linear on logits) back to the
        # stored anisotropic rotated grid, argmax — then Dice against the
        # untouched stored label (reference: monai_unet.py:595-639)
        from segmantic_tpu.infer.predict import segment_volume
        from segmantic_tpu.io.nifti import read_volume
        from segmantic_tpu.train.trainer import SegmentationModel

        model = (SegmentationModel.load(result.best_checkpoint)
                 if result.best_checkpoint else result.model)
        datalist = json.loads((root / "datalist.json").read_text())
        dices = []
        for case in datalist["validation"]:
            pred, _ = segment_volume(model, Path(case["image"]),
                                     spacing=SPACING_PRE)
            lbl = read_volume(case["label"]).data[0]
            dices.append(present_class_dice(np.asarray(pred.data[0]), lbl))
        print(f"JAX_ORIG_DICE {np.nanmean(dices):.4f} "
              f"per_case={np.round(dices, 4).tolist()}", flush=True)


# --------------------------------------------------------------- torch side
def _torch_model():
    """The reference's residual UNet topology in torch (structure per
    reference: src/segmantic/seg/monai_unet.py:105-124; see module
    docstring — written from the documented architecture, not from MONAI
    source)."""
    import torch
    from torch import nn

    def conv_unit(cin, cout, stride, last=False, transposed=False):
        if transposed:
            conv = nn.ConvTranspose3d(cin, cout, 3, stride=stride,
                                      padding=1, output_padding=stride - 1)
        else:
            conv = nn.Conv3d(cin, cout, 3, stride=stride, padding=1)
        if last:
            return nn.Sequential(conv)
        return nn.Sequential(conv, nn.BatchNorm3d(cout, eps=1e-5),
                             nn.PReLU(num_parameters=1, init=0.25))

    class ResUnit(nn.Module):
        def __init__(self, cin, cout, stride, subunits=2, last_conv_only=False):
            super().__init__()
            seq, c = [], cin
            for i in range(subunits):
                seq.append(conv_unit(
                    c, cout, stride if i == 0 else 1,
                    last=last_conv_only and i == subunits - 1))
                c = cout
            self.body = nn.Sequential(*seq)
            if stride != 1 or cin != cout:
                k = 3 if stride != 1 else 1
                self.short = nn.Conv3d(cin, cout, k, stride=stride,
                                       padding=k // 2)
            else:
                self.short = nn.Identity()

        def forward(self, x):
            return self.body(x) + self.short(x)

    class UNetTorch(nn.Module):
        def __init__(self):
            super().__init__()
            chans, strides = list(CHANNELS), list(STRIDES)
            self.downs = nn.ModuleList()
            c = 1
            for ch, s in zip(chans[:-1], strides):
                self.downs.append(ResUnit(c, ch, s))
                c = ch
            self.bottom = ResUnit(c, chans[-1], 1)
            self.ups = nn.ModuleList()
            self.post = nn.ModuleList()
            c = chans[-1]
            for lvl in reversed(range(len(strides))):
                is_top = lvl == 0
                out = NUM_CLASSES if is_top else chans[lvl - 1]
                self.ups.append(conv_unit(c + chans[lvl], out, strides[lvl],
                                          transposed=True))
                self.post.append(ResUnit(out, out, 1, subunits=1,
                                         last_conv_only=is_top))
                c = out

        def forward(self, x):
            skips = []
            for d in self.downs:
                x = d(x)
                skips.append(x)
            x = self.bottom(x)
            for up, post, skip in zip(self.ups, self.post, reversed(skips)):
                x = post(up(torch.cat([skip, x], dim=1)))
            return x

    return UNetTorch()


def _nearest_ras(direction: np.ndarray) -> np.ndarray:
    """Signed column permutation of ``direction`` nearest to RAS (the
    MONAI Orientationd axcode pick): greedy max-|cos| assignment; the sign
    fix makes every diagonal entry positive, so negative-determinant
    (flipped) affines orient correctly."""
    D = np.asarray(direction, float)
    out = np.zeros((3, 3))
    cols = list(range(3))
    for a in range(3):
        j = max(cols, key=lambda c: abs(D[a, c]))
        cols.remove(j)
        out[:, a] = D[:, j] * np.sign(D[a, j])
    return out


def run_torch(root: Path) -> None:
    import copy

    import torch
    import torch.nn.functional as F

    from segmantic_tpu.io.nifti import read_volume

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    datalist = json.loads((root / "datalist.json").read_text())

    def load(case):
        vol = read_volume(case["image"])
        img = vol.data[0].astype(np.float32)
        lbl = read_volume(case["label"]).data[0].astype(np.int64)
        img = (img - img.mean()) / max(img.std(), 1e-8)  # z-score
        idx = np.argwhere(lbl > 0)  # crop-foreground from the label
        lo, hi = idx.min(0), idx.max(0) + 1
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        img_c, lbl_c = img[sl], lbl[sl]
        if not GEO:
            pad = [(0, max(0, PATCH - s)) for s in img_c.shape]
            return np.pad(img_c, pad), np.pad(lbl_c, pad), None
        # reference preprocessing order on real geometry: orient(RAS) +
        # spacing-resample to 1.2 mm iso as ONE combined scipy resample
        # from the cropped stored grid onto a nearest-RAS-oriented
        # isotropic grid (MONAI Orientationd permutes/flips, Spacingd
        # keeps direction; reference: monai_unet.py:151-176)
        from scipy.ndimage import affine_transform

        A_c = vol.affine.copy()
        A_c[:3, 3] = A_c[:3, :3] @ lo + A_c[:3, 3]  # crop shifts the origin
        norms = np.linalg.norm(A_c[:3, :3], axis=0)
        Dor = _nearest_ras(A_c[:3, :3] / norms[None, :])
        s_new = np.asarray(SPACING_PRE)
        corners = np.stack(np.meshgrid(
            *[(0.0, s - 1.0) for s in img_c.shape], indexing="ij"),
            -1).reshape(-1, 3)
        phys = corners @ A_c[:3, :3].T + A_c[:3, 3]
        y = (phys @ Dor) / s_new  # Dor.T @ phys per corner, in new voxels
        lo_y = np.floor(y.min(0))
        out_shape = tuple((np.ceil(y.max(0)) - lo_y + 1).astype(int))
        A_dst = np.eye(4)
        A_dst[:3, :3] = Dor * s_new[None, :]
        A_dst[:3, 3] = Dor @ (lo_y * s_new)
        M = np.linalg.inv(A_c) @ A_dst  # dst index -> src-crop index
        img_d = affine_transform(img_c, M[:3, :3], offset=M[:3, 3],
                                 output_shape=out_shape, order=1)
        lbl_d = affine_transform(lbl_c, M[:3, :3], offset=M[:3, 3],
                                 output_shape=out_shape, order=0)
        pad = [(0, max(0, PATCH - s)) for s in img_d.shape]
        inv = {"A_dst": A_dst, "A_c": A_c, "crop": sl,
               "crop_shape": img_c.shape, "orig_shape": img.shape,
               "orig_lbl": read_volume(case["label"]).data[0].astype(np.int64)}
        return np.pad(img_d, pad), np.pad(lbl_d, pad), inv

    train_vols = [load(c)[:2] for c in datalist["training"]]
    val_loaded = [load(c) for c in datalist["validation"]]
    val_vols = [v[:2] for v in val_loaded]

    def spatial_aug(img, lbl):
        """Reference-style whole-volume spatial augmentation: per-axis
        rotations (p=.2, range .4 rad) + isotropic zoom (p=.2, .8-1.3),
        shape kept, linear/NN interp (MONAI RandRotated/RandZoomd
        semantics; reference: monai_unet.py:181-191)."""
        from scipy.ndimage import affine_transform

        rot = np.eye(3)
        for axis in range(3):
            if rng.random() >= ROT_P:
                continue
            a, b = [d for d in range(3) if d != axis]
            t = rng.uniform(-ROT_RANGE, ROT_RANGE)
            m = np.eye(3)
            m[a, a] = m[b, b] = np.cos(t)
            m[a, b], m[b, a] = -np.sin(t), np.sin(t)
            rot = m @ rot
        zoom = rng.uniform(*ZOOM_RANGE) if rng.random() < ZOOM_P else 1.0
        if np.allclose(rot, np.eye(3)) and zoom == 1.0:
            return img, lbl
        # output voxel o reads input c_in + M (o - c_out), M = inv(R)/zoom
        mat = np.linalg.inv(rot) / zoom
        center = (np.asarray(img.shape) - 1) / 2.0
        offset = center - mat @ center
        img = affine_transform(img, mat, offset=offset, order=1, cval=0.0)
        lbl = affine_transform(lbl, mat, offset=offset, order=0, cval=0.0)
        return img, lbl

    def sample_patches(img, lbl, n):
        """Class-balanced crops: centers drawn from fg classes (bg ratio 0;
        reference: monai_unet.py:195-203)."""
        if AUG:
            img, lbl = spatial_aug(img, lbl)
            pad = [(0, max(0, PATCH - s)) for s in img.shape]
            img, lbl = np.pad(img, pad), np.pad(lbl, pad)
        out = []
        classes = [c for c in np.unique(lbl) if c > 0]
        if not classes:  # a zoom-out can push all fg out of frame
            classes = [0]
        locs = {c: np.argwhere(lbl == c) for c in classes}
        for _ in range(n):
            c = classes[rng.integers(len(classes))]
            center = locs[c][rng.integers(len(locs[c]))]
            start = [int(np.clip(ctr - PATCH // 2, 0, s - PATCH))
                     for ctr, s in zip(center, img.shape)]
            sl = tuple(slice(a, a + PATCH) for a in start)
            ip, lp = img[sl], lbl[sl]
            flips = [a for a in range(3) if rng.random() < FLIP_P]
            if flips:
                ip, lp = np.flip(ip, flips), np.flip(lp, flips)
            out.append((ip.copy(), lp.copy()))
        return out

    def dice_loss(logits, target):
        # per-(sample, class) dice, mean-reduced — the MONAI DiceLoss
        # default the reference trains with (reference: monai_unet.py:128);
        # H2H_BATCH_DICE=1 pools voxels over the batch instead (not the
        # reference semantics; kept for the reduction A/B)
        probs = torch.softmax(logits, dim=1)
        onehot = F.one_hot(target, NUM_CLASSES).permute(0, 4, 1, 2, 3).float()
        dims = (0, 2, 3, 4) if os.environ.get("H2H_BATCH_DICE") else (2, 3, 4)
        inter = (probs * onehot).sum(dims)
        denom = probs.sum(dims) + onehot.sum(dims)
        return (1.0 - (2 * inter + 1e-5) / (denom + 1e-5)).mean()

    model = _torch_model()
    if os.environ.get("H2H_TORCH_INIT", "") == "lecun":
        # isolate the init variable: flax-style lecun_normal + zero bias
        # (vs torch's default kaiming_uniform + uniform bias)
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, (torch.nn.Conv3d, torch.nn.ConvTranspose3d)):
                    w = m.weight
                    fan_in = int(np.prod(w.shape[1:])) if isinstance(
                        m, torch.nn.Conv3d) else int(
                        w.shape[0] * np.prod(w.shape[2:]))
                    w.normal_(0.0, float(np.sqrt(1.0 / fan_in)))
                    if m.bias is not None:
                        m.bias.zero_()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    best, curve, best_state = 0.0, [], None
    for _ in range(EPOCHS):
        model.train()
        order = rng.permutation(len(train_vols))
        for i in range(0, len(order), BATCH_VOLS):
            patches = []
            for j in order[i:i + BATCH_VOLS]:
                patches += sample_patches(*train_vols[j], NUM_SAMPLES)
            x = torch.from_numpy(np.stack([p[0] for p in patches])[:, None])
            y = torch.from_numpy(np.stack([p[1] for p in patches]))
            opt.zero_grad()
            loss = dice_loss(model(x), y)
            loss.backward()
            opt.step()
        model.eval()
        dices = []
        with torch.no_grad():
            for img, lbl in val_vols:
                # pad to a stride multiple for the whole-volume forward,
                # crop the prediction back (inference plumbing only)
                m = int(np.prod(STRIDES))
                pad = [(0, (-s) % m) for s in img.shape]
                xin = np.pad(img, pad)
                pred = model(torch.from_numpy(xin[None, None]))
                pred = pred.argmax(1)[0].numpy()
                pred = pred[tuple(slice(0, s) for s in lbl.shape)]
                per = []
                for c in range(1, NUM_CLASSES):
                    if (lbl == c).any() or (pred == c).any():
                        tp = ((pred == c) & (lbl == c)).sum()
                        per.append(2 * tp / ((pred == c).sum()
                                             + (lbl == c).sum()))
                dices.append(np.mean(per) if per else np.nan)
        d = float(np.nanmean(dices))
        curve.append(d)
        if d > best:
            best, best_state = d, copy.deepcopy(model.state_dict())
    print(f"TORCH_RESULT best={best:.4f} "
          f"curve={np.round(curve, 4).tolist()}", flush=True)
    if GEO:
        # ORIG-space Dice, best epoch's weights: whole-volume forward on
        # the preprocessed grid, invert the LOGITS linearly back onto the
        # stored grid (the reference's Invertd-before-argmax order,
        # monai_unet.py:595-639), argmax, embed in the uncropped frame
        from scipy.ndimage import affine_transform

        if best_state is not None:
            model.load_state_dict(best_state)
        model.eval()
        ods = []
        with torch.no_grad():
            for img, lbl, inv in val_loaded:
                m = int(np.prod(STRIDES))
                pad = [(0, (-s) % m) for s in img.shape]
                logits = model(
                    torch.from_numpy(np.pad(img, pad)[None, None])
                )[0].numpy()
                M2 = np.linalg.inv(inv["A_dst"]) @ inv["A_c"]
                chans = [affine_transform(
                    logits[c], M2[:3, :3], offset=M2[:3, 3],
                    output_shape=inv["crop_shape"], order=1)
                    for c in range(NUM_CLASSES)]
                pred = np.argmax(np.stack(chans), 0)
                full = np.zeros(inv["orig_shape"], np.int64)
                full[inv["crop"]] = pred
                ods.append(present_class_dice(full, inv["orig_lbl"]))
        print(f"TORCH_ORIG_DICE {np.nanmean(ods):.4f} "
              f"per_case={np.round(ods, 4).tolist()}", flush=True)


# ----------------------------------------------------------------- driver
def main():
    if len(sys.argv) > 1:
        mode, root = sys.argv[1], Path(sys.argv[2])
        if mode == "gen":
            gen_dataset(root)
        elif mode == "jax":
            run_jax(root)
        elif mode == "torch":
            run_torch(root)
        return

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        gen_dataset(root)
        env = {**os.environ, "SEGMANTIC_FORCE_PLATFORM": "cpu",
               "JAX_PLATFORMS": "cpu"}
        env.pop("PALLAS_AXON_POOL_IPS", None)
        for side in ("torch", "jax"):
            r = subprocess.run(
                [sys.executable, __file__, side, str(root)],
                env=env, capture_output=True, text=True)
            tail = [ln for ln in r.stdout.splitlines()
                    if "RESULT" in ln or "ORIG_DICE" in ln]
            ok = tail and r.returncode == 0
            print("\n".join(tail) if ok
                  else f"{side} FAILED (rc={r.returncode}):\n"
                       f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}",
                  flush=True)


if __name__ == "__main__":
    main()
