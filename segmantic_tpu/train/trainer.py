"""The ``train()`` orchestrator: data → fused pipeline → pjit loop → ckpts.

Config surface parity with the reference's orchestrator — same keyword
signature (the CLI schema IS this signature, like the reference's;
reference: src/segmantic/seg/monai_unet.py:400-548) — but a TPU-native
execution model:

- deterministic preprocessing runs once per volume into a host RAM cache
  with per-class crop indices (replaces CacheDataset);
- each step, margin patches are memcpy-cropped on host, transferred
  channel-last, and augmented FUSED ON DEVICE inside the jitted train step
  (rotation∘zoom∘crop as one affine gather + intensity zoo + flips);
- the train step is jit-compiled over a ``data``-axis mesh: batch sharded,
  params replicated, gradient all-reduce compiled by XLA onto ICI
  (replaces pl.Trainer(devices=...) + DDP/NCCL);
- bf16 compute under ``mixed_precision`` (replaces AMP fp16);
- validation = sliding-window inference (roi 160^d) + Dice, scheduler
  stepped per val epoch, top-3 checkpoints by val_dice, early stopping.
"""

from __future__ import annotations

import dataclasses
import os
import json
import math
import time
import warnings
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.cache import PatchSampler, PrefetchLoader, VolumeCache
from ..data.dataset import PairedDataSet
from ..image.labels import load_decathlon_tissuelist, load_tissue_list
from ..infer.sliding_window import sliding_window_inference
from ..metrics.overlap import confusion_matrix, dice_from_confusion
from ..models.unet import UNet
from ..ops import fast_conv, pallas_conv
from ..parallel.mesh import (
    make_mesh,
    put_batch,
    replicate,
    shard_opt_state,
    shard_params,
    zero_placement,
)
from jax.sharding import NamedSharding, PartitionSpec as P
from ..transforms import spatial as TS
from ..transforms.base import Compose
from ..transforms.registry import build_pipeline
from ..utils.json import PathEncoder
from .augment import AugmentConfig, augment_batch
from .checkpoint import TopKCheckpoints, load_checkpoint, save_checkpoint
from .losses import dice_loss, dice_loss_phase
from .optim import (
    DEFAULT_LR_SCHEDULING,
    DEFAULT_OPTIMIZER,
    LRScheduler,
    make_optimizer,
    set_learning_rate,
)


def default_preprocessing(
    keys: Sequence[str], spacing: Sequence[float] = ()
) -> Compose:
    """orient(RAS) → z-score → crop-foreground → cast [→ spacing-resample]
    (reference: src/segmantic/seg/monai_unet.py:151-176)."""
    keys = list(keys)
    xforms: List[Any] = [
        TS.LoadImaged(keys=keys),
        TS.Orientationd(keys=keys),
        TS.NormalizeIntensityd(keys="image", nonzero=False, channel_wise=True),
        TS.CropForegroundd(
            keys=keys, source_key="label" if "label" in keys else "image"
        ),
        TS.EnsureTyped(keys=keys),
    ]
    if spacing:
        xforms.append(TS.Spacingd(keys=keys, pixdim=list(spacing)))
    return Compose(xforms)


@dataclasses.dataclass
class SegmentationModel:
    """Model bundle: flax module + variables + hparams (the Net equivalent)."""

    module: UNet
    variables: Dict[str, Any]
    hparams: Dict[str, Any]

    @property
    def spatial_dims(self) -> int:
        return self.module.spatial_dims

    @property
    def num_classes(self) -> int:
        return self.module.out_channels

    @property
    def spatial_size(self) -> List[int]:
        return list(self.hparams.get("spatial_size") or [96] * self.spatial_dims)

    def apply(self, x: jax.Array, training: bool = False) -> jax.Array:
        return self.module.apply(self.variables, x, training=training)

    @staticmethod
    def create(
        *,
        num_classes: int,
        num_channels: int = 1,
        spatial_dims: int = 3,
        spatial_size: Optional[Sequence[int]] = None,
        channels: Tuple[int, ...] = (16, 32, 64, 128, 256),
        strides: Tuple[int, ...] = (2, 2, 2, 2),
        dropout: float = 0.0,
        act: str = "PRELU",
        num_res_units: int = 2,
        norm: str = "BATCH",
        arch: str = "unet",
        arch_params: Optional[dict] = None,
        seed: int = 0,
    ) -> "SegmentationModel":
        """``arch`` selects the architecture: ``unet`` (the reference's
        topology, configured by channels/strides/num_res_units/norm/act),
        ``segresnet`` (configured by ``arch_params``:
        init_filters/blocks_down/blocks_up/norm/act — canonical GroupNorm +
        ReLU defaults), or ``unetr`` (ViT encoder + deconv decoder;
        ``arch_params``: hidden_size/num_layers/num_heads/mlp_dim/
        feature_size/patch_size/norm — MONAI UNETR defaults; spatial_size
        must divide patch_size). The UNet-oriented top-level keys do not
        apply to the other architectures."""
        arch = (arch or "unet").lower()
        ap = dict(arch_params or {})
        hparams = {
            "num_classes": num_classes,
            "num_channels": num_channels,
            "spatial_dims": spatial_dims,
            "spatial_size": list(spatial_size) if spatial_size else None,
            "channels": list(channels),
            "strides": list(strides),
            "dropout": dropout,
            "act": act,
            "num_res_units": num_res_units,
            "norm": norm,
            "arch": arch,
            "arch_params": ap,
        }
        if arch == "unet":
            module = UNet(
                spatial_dims=spatial_dims,
                in_channels=num_channels,
                out_channels=num_classes,
                channels=tuple(channels),
                strides=tuple(strides),
                dropout=dropout,
                act=act,
                num_res_units=num_res_units,
                norm=norm,
            )
            depth = len(strides)
        elif arch == "segresnet":
            from ..models.segresnet import SegResNet

            blocks_down = tuple(ap.get("blocks_down", (1, 2, 2, 4)))
            module = SegResNet(
                spatial_dims=spatial_dims,
                in_channels=num_channels,
                out_channels=num_classes,
                init_filters=int(ap.get("init_filters", 8)),
                blocks_down=blocks_down,
                blocks_up=tuple(
                    ap.get("blocks_up", (1,) * (len(blocks_down) - 1))
                ),
                norm=ap.get("norm", "GROUP"),
                act=ap.get("act", "RELU"),
                dropout=dropout,
            )
            depth = len(blocks_down) - 1
        elif arch == "unetr":
            from ..models.unetr import UNETR

            patch = int(ap.get("patch_size", 16))
            module = UNETR(
                spatial_dims=spatial_dims,
                in_channels=num_channels,
                out_channels=num_classes,
                hidden_size=int(ap.get("hidden_size", 768)),
                num_layers=int(ap.get("num_layers", 12)),
                num_heads=int(ap.get("num_heads", 12)),
                mlp_dim=int(ap.get("mlp_dim", 3072)),
                feature_size=int(ap.get("feature_size", 16)),
                patch_size=patch,
                norm=ap.get("norm", "INSTANCE"),
            )
            depth = patch.bit_length() - 1  # probe needs % patch == 0
        else:
            raise ValueError(f"unsupported arch {arch!r}")
        if arch == "unetr":
            # the ViT positional embedding ties params to the token grid,
            # so UNETR must init (and run inference windows) at the actual
            # training patch size
            if not spatial_size:
                raise ValueError("arch='unetr' requires spatial_size")
            probe_shape = (1,) + tuple(spatial_size) + (num_channels,)
        else:
            probe_shape = (1,) + (max(16, 2 ** depth),) * spatial_dims + (
                num_channels,
            )
        variables = module.init(
            jax.random.key(seed), jnp.zeros(probe_shape, jnp.float32), training=False
        )
        return SegmentationModel(module=module, variables=dict(variables), hparams=hparams)

    @staticmethod
    def load(path: Path) -> "SegmentationModel":
        ckpt = load_checkpoint(path)
        h = dict(ckpt.get("hparams") or {})
        # legacy sidecar settings: a <ckpt>.json next to the checkpoint holds
        # the model hyperparameters and takes precedence over in-file hparams
        # (reference: src/segmantic/seg/monai_unet.py:564-569)
        sidecar = Path(path).with_suffix(".json")
        if sidecar.exists():
            warnings.warn(f"loading legacy model settings from {sidecar}")
            h.update(json.loads(sidecar.read_text()))
        model = SegmentationModel.create(
            num_classes=h["num_classes"],
            num_channels=h.get("num_channels", 1),
            spatial_dims=h.get("spatial_dims", 3),
            spatial_size=h.get("spatial_size"),
            channels=tuple(h.get("channels", (16, 32, 64, 128, 256))),
            strides=tuple(h.get("strides", (2, 2, 2, 2))),
            dropout=h.get("dropout", 0.0),
            act=h.get("act", "PRELU"),
            num_res_units=h.get("num_res_units", 2),
            norm=h.get("norm", "BATCH"),
            arch=h.get("arch", "unet"),
            arch_params=h.get("arch_params"),
        )
        template = model.variables
        stored = dict(ckpt["variables"])
        # tolerate empty collections on either side: a GroupNorm model has
        # no batch_stats, but the trainer saves the collection (as {})
        extra = {
            k: v for k, v in stored.items() if k not in template and v
        }
        if extra:
            raise ValueError(
                f"checkpoint has unexpected variable collections: "
                f"{sorted(extra)}"
            )
        missing = [
            k for k, v in template.items() if v and k not in stored
        ]
        if missing:
            raise ValueError(
                f"checkpoint is missing variable collections: {missing}"
            )
        restored = {
            col: jax.tree_util.tree_map(
                lambda t, s: np.asarray(s, dtype=np.asarray(t).dtype).reshape(
                    np.asarray(t).shape
                ),
                tmpl,
                stored.get(col, tmpl),
            )
            for col, tmpl in template.items()
        }
        model.variables = restored
        return model


@dataclasses.dataclass
class TrainResult:
    output_dir: Path
    best_checkpoint: Optional[Path]
    best_val_dice: float
    best_val_epoch: int
    history: List[Dict[str, float]]
    model: SegmentationModel


def _make_tb_writer(output_dir: Path):
    """TensorBoard writer for ``output_dir/logs``, or None with a warning.

    The reference always logs scalars (reference:
    src/segmantic/seg/monai_unet.py:502); a missing tensorboardX must not
    silently drop them.
    """
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(logdir=str(Path(output_dir) / "logs"))
    except Exception as err:
        warnings.warn(
            f"tensorboardX unavailable ({err}) — scalar logs will only go to "
            "history.json and the console"
        )
        return None


def _resolve_num_classes(
    num_classes: int, tissue_list: Optional[Path], datalist: Optional[Path]
) -> int:
    """num_classes > 0 wins; otherwise tissue_list, then decathlon labels
    (reference: src/segmantic/seg/monai_unet.py:452-466)."""
    if num_classes > 0 and tissue_list:
        raise ValueError(
            "'num_classes' and 'tissue_list' are redundant. Prefer 'num_classes'."
        )
    if num_classes <= 0:
        if tissue_list:
            tissues = load_tissue_list(Path(tissue_list))
        elif datalist:
            first = datalist[0] if isinstance(datalist, (list, tuple)) else datalist
            tissues = load_decathlon_tissuelist(Path(first))
        else:
            raise ValueError("need num_classes, tissue_list, or datalist labels")
        num_classes = max(tissues.values()) + 1
        if len(tissues) != num_classes:
            raise ValueError("Expecting contiguous labels in range [0,N-1]")
    if num_classes <= 1:
        raise ValueError("'num_classes' is expected to be > 1")
    return num_classes


def make_train_step(module: UNet, optimizer, aug_cfg: AugmentConfig, patch_size,
                    mixed_precision: bool, mesh=None, remat: bool = False,
                    zero: bool = False):
    """Build the jitted train step: fused device augmentation + fwd/bwd +
    optax update; donates params/opt_state to avoid HBM copies.

    With a data-parallel ``mesh`` (model axis of 1, data axis > 1) the
    AUGMENTATION and the forward/backward run under ``shard_map``: each
    device augments its local batch (per-shard RNG stream; the exact-count
    batch subsets select within the shard, so no batch-axis collective is
    ever induced) and computes its local-batch loss and gradients
    (BatchNorm statistics reduce globally via its ``axis_name``),
    gradients/loss ``pmean`` over 'data', and the replicated optimizer
    update stays outside. Numerically equivalent to
    the GSPMD-partitioned step, but the per-shard body sees LOCAL shapes,
    which lets the batch-packed Pallas convs route on multi-device meshes
    (a pallas_call inside a GSPMD jit cannot be partitioned). Tensor-
    parallel meshes (model axis > 1) keep the GSPMD step.

    ``zero`` (ZeRO-1): the optimizer state is partitioned over 'data'
    (``parallel.mesh.shard_opt_state``) and the update runs shardwise —
    gradients are constrained to the same partition (XLA lowers the
    gradient reduction to reduce-scatter), each device updates its 1/N
    slice of the moments, and the fresh params are constrained back to
    replicated (all-gather). Same total collective bytes as a plain
    all-reduce (reduce-scatter + all-gather), 1/N the optimizer memory
    and update FLOPs per device. Exact — test-pinned against the
    replicated update."""
    dp_size = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    shard_grads = (
        mesh is not None and int(mesh.shape.get("model", 1)) == 1 and dp_size > 1
    )
    use_zero = bool(zero) and mesh is not None and dp_size > 1
    if zero and not use_zero:
        raise ValueError("zero=True needs a mesh with a data axis > 1")
    norm_axis = "data" if shard_grads else None
    # bf16 interp in the spatial augmentation only when the step computes
    # in bf16 anyway (the cast after augment would round identically)
    aug_cfg = dataclasses.replace(
        aug_cfg, interp_bf16=aug_cfg.interp_bf16 and mixed_precision
    )

    # phase-major loss (default on): the Dice loss consumes the top phase
    # stage's tensor directly — exact (Dice sums are voxel-permutation-
    # invariant; test-pinned) — skipping the final depth-to-space and the
    # full-resolution logits. With the matmul-segmented dice formulation
    # (losses.py::_dice_phase_mm) this removes ~60 ms of the 197 ms
    # 32x96^3 fwd+bwd on v5e: the plain full-res dice makes XLA
    # materialize ~9 GB of f32 normalizer broadcasts + relayout copies
    # against the depth-to-space view (exp/dice_hlo.py, exp/dice_cost5.py).
    use_phase_logits = (
        os.environ.get("SEGMANTIC_PHASE_DICE", "on").lower()
        in ("1", "on", "true", "auto")
        and module.phase_top_ok()
        and all(p % 2 == 0 for p in patch_size)
    )

    def make_lag(use_axis: bool):
        axis = norm_axis if use_axis else None

        def apply_model(p, bs, im):
            return module.apply(
                {"params": p, "batch_stats": bs},
                im,
                training=True,
                mutable=["batch_stats"],
                norm_axis=axis,
                phase_logits=use_phase_logits,
            )

        if remat:
            # rematerialize the whole forward in the backward pass: trades
            # ~one extra forward of FLOPs for not keeping activations live —
            # the standard XLA recipe for patches/models too big for HBM
            apply_model = jax.checkpoint(apply_model)

        def loss_and_grads(params, batch_stats, image, label):
            with pallas_conv.packed_routing(True if use_axis else None):

                def loss_fn(p):
                    out, mutated = apply_model(p, batch_stats, image)
                    if use_phase_logits:
                        # the s2d is a relayout copy — do it at u8 width
                        # (4x less traffic than s32; exp/hlo_cycles.py)
                        lbl = label
                        if module.out_channels <= 255:
                            lbl = label.astype(jnp.uint8)
                        label_ph = fast_conv.space_to_depth(lbl[..., None])
                        loss = dice_loss_phase(out, label_ph)
                    else:
                        loss = dice_loss(out, label)
                    return loss, mutated.get(
                        "batch_stats", batch_stats
                    )

                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
            if use_axis:
                loss, grads = jax.lax.pmean((loss, grads), "data")
            return loss, new_bs, grads

        return loss_and_grads

    plain_lag = make_lag(False)

    def augment_in(image, label, key):
        # wire dtypes may be compact (bf16 image / uint8 label); augment in
        # f32 — EXCEPT when the first augmentation op is the bf16 banded
        # interp anyway: upcasting a bf16 wire image just to re-cast it
        # materializes two full margin-volume sweeps (exp/hlo_cycles.py)
        if not (aug_cfg.spatial and aug_cfg.interp_bf16
                and image.dtype == jnp.bfloat16):
            image = image.astype(jnp.float32)
        image, label = augment_batch(image, label, key, aug_cfg, tuple(patch_size))
        if mixed_precision:
            image = image.astype(jnp.bfloat16)
        return image, label

    sharded_lag = None
    if shard_grads:
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        inner_lag = make_lag(True)

        def sharded_body(p, bs, image, label, key_data):
            # Augment INSIDE the dp body, on the shard-local batch with a
            # per-shard RNG stream: every batch-axis permute/gather in the
            # augmentation (spatial/Gibbs/spike exact-count subsets) stays
            # on-shard — no cross-chip all-to-all resharding, and the
            # subset work splits evenly across shards (count is
            # round(p * local_B) per shard rather than round(p * B)
            # globally; the per-sample marginal is identical up to count
            # rounding). Keys cross shard_map as raw uint32 key data.
            k = jax.random.wrap_key_data(key_data)
            k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            image, label = augment_in(image, label, k)
            return inner_lag(p, bs, image, label)

        specs = dict(
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P()),
            out_specs=(P(), P(), P()),
        )
        try:  # jax >= 0.8 names the replication check check_vma
            sharded_lag = shard_map(sharded_body, check_vma=False, **specs)
        except TypeError:
            sharded_lag = shard_map(sharded_body, check_rep=False, **specs)

    def step(params, batch_stats, opt_state, image, label, key):
        if not jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.wrap_key_data(key)
        # the shard_map body requires batch % data-axis == 0; tiny debug
        # batches (put_batch replicates those) keep the GSPMD step. Static
        # shapes: resolved at trace time, one branch compiles.
        if sharded_lag is not None and image.shape[0] % dp_size == 0:
            loss, new_bs, grads = sharded_lag(
                params, batch_stats, image, label, jax.random.key_data(key)
            )
        else:
            image, label = augment_in(image, label, key)
            loss, new_bs, grads = plain_lag(params, batch_stats, image, label)
        if use_zero:
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.with_sharding_constraint(
                    g, zero_placement(mesh, g)
                ),
                grads,
            )
        updates, new_opt = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if use_zero:
            replicated = NamedSharding(mesh, P())
            params = jax.tree_util.tree_map(
                lambda p: jax.lax.with_sharding_constraint(p, replicated), params
            )
        return params, new_bs, new_opt, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_val_forward(module: UNet, compute_dtype=jnp.bfloat16):
    """Jitted eval forward created ONCE per model (stable jit cache across
    validation epochs — variables are an argument, not a closure).

    Windows are cast to ``compute_dtype`` (bf16 by default, like training
    mixed precision) and logits returned in f32 for blending. Supported
    configurations route through the packed-layout executor
    (:mod:`segmantic_tpu.infer.executor`: folded norms, Pallas packed conv
    chains; disable with SEGMANTIC_EVAL_EXECUTOR=off)."""
    from ..infer.executor import (
        executor_enabled, executor_supported, make_eval_forward,
    )

    if executor_enabled() and executor_supported(module):
        return make_eval_forward(module, compute_dtype)

    @jax.jit
    def val_forward(variables, windows):
        out = module.apply(variables, windows.astype(compute_dtype), training=False)
        return out.astype(jnp.float32)

    return val_forward


def validate(
    model_module: UNet,
    variables: Dict[str, Any],
    cache: VolumeCache,
    num_classes: int,
    spatial_dims: int,
    roi: Optional[Sequence[int]] = None,
    sw_batch_size: int = 4,
    val_forward=None,
    overlap: float = 0.25,
    blend_mode: str = "gaussian",
) -> Tuple[float, float]:
    """Sliding-window validation → (mean val_dice excl. background, val_loss).

    Mirrors the reference's validation (roi 160^d, DiceLoss on blended
    logits, DiceMetric(include_background=False); reference:
    src/segmantic/seg/monai_unet.py:350-397). ``overlap``/``blend_mode``
    expose the inferer knobs the reference leaves on MONAI defaults.
    """
    roi = list(roi) if roi else [160] * spatial_dims
    if val_forward is None:
        val_forward = make_val_forward(model_module)

    def predictor(windows):
        return val_forward(variables, windows)

    dices, losses = [], []
    for i in range(len(cache)):
        vol = cache[i]
        image = np.moveaxis(vol.image.numpy(), 0, -1)  # (*spatial, C)
        label = vol.label.numpy()[0]
        logits = sliding_window_inference(
            image, roi, sw_batch_size, predictor, overlap=overlap,
            mode=blend_mode,
        )
        losses.append(
            float(dice_loss(logits[None], jnp.asarray(label)[None]))
        )
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        cm = confusion_matrix(num_classes, label.astype(np.int64), pred.astype(np.int64))
        per_class = dice_from_confusion(cm)
        present = np.zeros(num_classes, bool)
        present[np.unique(label.astype(np.int64))] = True
        present[np.unique(pred.astype(np.int64))] = True
        sel = present.copy()
        sel[0] = False  # exclude background
        dices.append(float(per_class[sel].mean()) if sel.any() else float("nan"))
    return float(np.nanmean(dices)), float(np.mean(losses))


def train(
    *,
    datalist: Optional[Path] = None,
    image_dir: Optional[Path] = None,
    labels_dir: Optional[Path] = None,
    output_dir: Path,
    checkpoint_file: Optional[Path] = None,
    num_classes: int = 0,
    num_channels: int = 1,
    spatial_dims: int = 3,
    spatial_size: Sequence[int] = (),
    preprocessing: dict = {},
    augmentation: dict = {},
    augment_intensity: bool = False,
    augment_spatial: bool = False,
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256),
    strides: Tuple[int, ...] = (2, 2, 2, 2),
    dropout: float = 0.0,
    act: str = "PRELU",
    num_res_units: int = 2,
    norm: str = "BATCH",
    arch: str = "unet",
    arch_params: dict = {},
    num_samples: int = 4,
    optimizer: Optional[dict] = None,
    lr_scheduling: Optional[dict] = None,
    max_epochs: int = 600,
    early_stop_patience: int = 50,
    mixed_precision: bool = True,
    cache_rate: float = 1.0,
    gpu_ids: Sequence[int] = (0,),
    model_parallel: int = 1,
    accumulate_steps: int = 1,
    remat: bool = False,
    zero_optimizer: bool = False,
    tissue_list: Optional[Path] = None,
    batch_size: int = 2,
    spacing: Sequence[float] = (),
    val_roi_size: Sequence[int] = (),
    val_overlap: float = 0.25,
    val_blend_mode: str = "gaussian",
    profile_dir: Optional[Path] = None,
    seed: int = 0,
) -> TrainResult:
    """Train a residual UNet; returns the best checkpoint + history.

    Same config keys as the reference's ``train`` signature
    (reference: src/segmantic/seg/monai_unet.py:400-427); ``gpu_ids`` is
    accepted for config compatibility but device placement comes from the
    JAX mesh (all local devices on the 'data' axis).

    ``model_parallel`` (TPU-native extra; the reference's only parallelism
    is a Lightning GPU list, monai_unet.py:529-538) splits the mesh into
    (data, model) axes: the batch shards over 'data' while wide conv
    kernels and their optimizer moments shard Megatron-style over 'model'
    (``parallel.mesh.shard_params``) — XLA inserts the tp collectives.
    Use for decoders too wide for one chip's HBM.

    ``accumulate_steps`` (extra) averages gradients over that many
    micro-batches before each optimizer update (optax.MultiSteps) — large
    effective batches without the HBM. ``remat`` (extra) rematerializes the
    forward during backward (jax.checkpoint): ~one extra forward of FLOPs
    buys training patches/models whose activations don't fit otherwise.
    Both are exact (gradient-equivalence tested).

    ``zero_optimizer`` (extra, ZeRO-1): partitions the optimizer moments
    over the 'data' mesh axis and updates shardwise — 1/N optimizer HBM
    per chip at the same collective volume (reduce-scatter + all-gather
    == all-reduce). Exact; requires >1 device and model_parallel=1.
    """
    optimizer_cfg = dict(DEFAULT_OPTIMIZER)
    optimizer_cfg.update(optimizer or {})
    scheduler_cfg = dict(DEFAULT_LR_SCHEDULING)
    scheduler_cfg.update(lr_scheduling or {})

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    num_classes = _resolve_num_classes(num_classes, tissue_list, datalist)

    # --- model -------------------------------------------------------------
    if checkpoint_file and Path(checkpoint_file).exists():
        model = SegmentationModel.load(Path(checkpoint_file))
        spatial_dims = model.spatial_dims
        num_classes = model.num_classes
    else:
        model = SegmentationModel.create(
            num_classes=num_classes,
            num_channels=num_channels,
            spatial_dims=spatial_dims,
            spatial_size=list(spatial_size) if spatial_size else None,
            channels=tuple(channels),
            strides=tuple(strides),
            dropout=dropout,
            act=act,
            num_res_units=num_res_units,
            norm=norm,
            arch=arch,
            arch_params=arch_params,
            seed=seed,
        )
    patch_size = model.spatial_size

    # --- data --------------------------------------------------------------
    if datalist:
        # single file or a LIST of datalist files (multi-dataset training)
        dataset = PairedDataSet.load_from_json(datalist)
    elif image_dir and labels_dir:
        dataset = PairedDataSet(
            Path(image_dir), "*.nii.gz", Path(labels_dir), "*.nii.gz",
            random_seed=seed,
        )
    else:
        raise ValueError("provide either datalist or image_dir+labels_dir")
    (output_dir / "Dataset.json").write_text(dataset.dump_dataset())

    keys = ["image", "label"]
    pre = build_pipeline(preprocessing) or default_preprocessing(keys, spacing)

    train_cache = VolumeCache(
        dataset.training_files(), pre, num_classes, cache_rate=cache_rate
    )
    val_cache = VolumeCache(
        dataset.validation_files(), pre, num_classes, cache_rate=cache_rate
    )

    # margin feeds fused device rotation/zoom (real-data borders)
    margin = max(patch_size) // 4 if augment_spatial else 0
    sampler = PatchSampler(
        train_cache,
        patch_size=patch_size,
        batch_size=batch_size * num_samples,
        num_samples=num_samples,
        margin=margin,
        # multi-host: each process draws distinct patches (put_batch then
        # assembles the global batch from the per-host rows)
        seed=seed + jax.process_index(),
        # bf16 wire halves H2D bytes; the step upcasts before augmentation
        image_wire_dtype=jnp.bfloat16 if mixed_precision else np.float32,
    )

    host_augment = build_pipeline(augmentation)  # user-config path (host)
    aug_cfg = AugmentConfig(spatial=augment_spatial, intensity=augment_intensity)

    # --- mesh + step -------------------------------------------------------
    if model_parallel < 1 or jax.device_count() % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the device count "
            f"({jax.device_count()})"
        )
    mesh = make_mesh(model=model_parallel)
    opt = make_optimizer(optimizer_cfg)
    if accumulate_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=int(accumulate_steps))
    if zero_optimizer and model_parallel > 1:
        raise ValueError("zero_optimizer does not combine with model_parallel")
    if zero_optimizer and int(mesh.shape["data"]) < 2:
        raise ValueError("zero_optimizer needs more than one device")
    if model_parallel > 1:
        # tensor-parallel placement: wide kernels shard over 'model'; the
        # optimizer moments inherit the sharding from zeros_like(params)
        params = shard_params(mesh, model.variables["params"])
        batch_stats = shard_params(mesh, model.variables.get("batch_stats", {}))
        opt_state = opt.init(params)
    else:
        params = replicate(mesh, model.variables["params"])
        batch_stats = replicate(mesh, model.variables.get("batch_stats", {}))
        opt_state = opt.init(params)
        opt_state = (
            shard_opt_state(mesh, opt_state)
            if zero_optimizer
            else replicate(mesh, opt_state)
        )
    train_step = make_train_step(
        model.module, opt, aug_cfg, patch_size, mixed_precision, mesh=mesh,
        remat=remat, zero=zero_optimizer,
    )

    scheduler = LRScheduler(optimizer_cfg["lr"], scheduler_cfg)

    # --- logging -----------------------------------------------------------
    writer = _make_tb_writer(output_dir)

    ckpts = TopKCheckpoints(output_dir, k=3)
    steps_per_epoch = max(1, math.ceil(len(train_cache) / batch_size))
    loader = PrefetchLoader(sampler) if host_augment is None else None
    val_forward = make_val_forward(model.module)

    best_dice, best_epoch, since_best = 0.0, -1, 0
    history: List[Dict[str, float]] = []
    rng_key = jax.random.key(seed)

    # tracing/profiling: capture a jax.profiler trace of the steady-state
    # steps of epoch 1 when profile_dir is set (SURVEY.md §5.1 — the
    # reference has no tracing; the trace feeds xprof/tensorboard)
    profiling = False

    try:
        for epoch in range(max_epochs):
            if profile_dir and epoch == 1 and not profiling:
                jax.profiler.start_trace(str(profile_dir))
                profiling = True
            t0 = time.time()
            epoch_loss = 0.0
            for step_i in range(steps_per_epoch):
                if loader is not None:
                    image_b, label_b = loader.next()
                else:
                    image_b, label_b = _host_augment_batch(
                        train_cache, host_augment, batch_size, num_samples, seed, epoch, step_i
                    )
                image_d = put_batch(mesh, image_b)
                label_d = put_batch(mesh, label_b)
                rng_key, step_key = jax.random.split(rng_key)
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state, image_d, label_d, step_key
                )
                epoch_loss += float(loss)
            epoch_loss /= steps_per_epoch
            train_seconds = time.time() - t0
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                print(f"wrote profiler trace to {profile_dir}")
            # throughput counters (labeled voxels/s across the whole mesh)
            voxels_per_step = batch_size * num_samples * int(np.prod(patch_size))
            voxels_per_sec = voxels_per_step * steps_per_epoch / max(train_seconds, 1e-9)

            # --- validation epoch ------------------------------------------
            variables = {"params": params, "batch_stats": batch_stats}
            if len(val_cache) > 0:
                val_dice, val_loss = validate(
                    model.module,
                    variables,
                    val_cache,
                    num_classes,
                    model.spatial_dims,
                    roi=list(val_roi_size) if val_roi_size else None,
                    val_forward=val_forward,
                    overlap=val_overlap,
                    blend_mode=val_blend_mode,
                )
            else:
                val_dice, val_loss = float("nan"), epoch_loss

            lr = scheduler.step(val_loss)
            opt_state = set_learning_rate(opt_state, lr)

            record = {
                "epoch": epoch,
                "train_loss": epoch_loss,
                "val_loss": val_loss,
                "val_dice": val_dice,
                "lr": lr,
                "seconds": time.time() - t0,
                "train_voxels_per_sec": voxels_per_sec,
            }
            history.append(record)
            if writer:
                writer.add_scalar("train_loss", epoch_loss, epoch)
                writer.add_scalar("val_loss", val_loss, epoch)
                writer.add_scalar("val_dice", val_dice, epoch)
                writer.add_scalar("lr", lr, epoch)
                writer.add_scalar("train_voxels_per_sec", voxels_per_sec, epoch)
            print(
                f"epoch {epoch}: train_loss={epoch_loss:.4f} "
                f"val_loss={val_loss:.4f} val_dice={val_dice:.4f} lr={lr:.2e}"
            )

            if not np.isfinite(val_loss):
                print("non-finite val_loss — stopping")
                break

            if np.isfinite(val_dice) and val_dice > best_dice:
                best_dice, best_epoch, since_best = val_dice, epoch, 0
            else:
                since_best += 1

            if np.isfinite(val_dice):
                ckpts.update(
                    epoch,
                    val_loss,
                    val_dice,
                    jax.device_get({"params": params, "batch_stats": batch_stats}),
                    model.hparams,
                )

            # always-current snapshot for interrupted-run resume
            save_checkpoint(
                output_dir / "last.ckpt",
                jax.device_get({"params": params, "batch_stats": batch_stats}),
                model.hparams,
                metrics={"epoch": epoch, "val_loss": val_loss, "val_dice": val_dice},
            )

            if since_best >= early_stop_patience:
                print(f"early stopping at epoch {epoch} (patience {early_stop_patience})")
                break
    finally:
        if profiling:
            jax.profiler.stop_trace()
        if loader is not None:
            loader.stop()
        if writer:
            writer.close()

    model.variables = jax.device_get(
        {"params": params, "batch_stats": batch_stats}
    )
    (output_dir / "history.json").write_text(
        json.dumps(history, cls=PathEncoder, indent=2)
    )
    return TrainResult(
        output_dir=output_dir,
        best_checkpoint=ckpts.best,
        best_val_dice=best_dice,
        best_val_epoch=best_epoch,
        history=history,
        model=model,
    )


def _host_augment_batch(
    cache: VolumeCache,
    augment: Compose,
    batch_size: int,
    num_samples: int,
    seed: int,
    epoch: int,
    step: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Config-driven augmentation path: run the user's Compose per volume on
    host (like the reference's MONAI-bundle pipelines), collate patches."""
    rng = np.random.default_rng((seed, epoch, step))
    images, labels = [], []
    for _ in range(batch_size):
        idx = int(rng.integers(len(cache)))
        vol = cache[idx]
        sample = {"image": vol.image, "label": vol.label}
        out = augment(sample, rng)
        items = out if isinstance(out, list) else [out]
        for item in items:
            images.append(np.moveaxis(item["image"].numpy(), 0, -1))
            labels.append(item["label"].numpy()[0])
    image_b = np.stack(images).astype(np.float32)
    label_b = np.stack(labels).astype(np.int32)
    return image_b, label_b
