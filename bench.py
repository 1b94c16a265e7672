"""Benchmark: end-to-end training throughput (labeled voxels/sec/chip).

Runs the flagship 3D residual UNet (reference-default topology
16-32-64-128-256, strides 2^4, batch norm, PReLU) with the production train
step — fused on-device augmentation (spatial affine matmuls + intensity zoo
+ flips), dice loss, backward, Adam — on synthetic 96^3 patches in bf16
mixed precision. The batch tries the TPU-right 128 first (the sweep knee:
32 -> 153M, 96 -> 233M, 128 -> 260M vox/s/chip on 16 GB HBM, 160 OOM —
exp/batch_sweep.py) and falls back to 96 / 64 if the shared pool's HBM is
tighter on this run. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"} where vs_baseline is against
the 50k labeled voxels/sec/chip north-star (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def run(batch: int) -> tuple:
    """One full measurement at this batch; returns (voxels/s/chip, mode,
    per-mode dict).

    When SEGMANTIC_PHASE_GEMM is unset, the Pallas phase-conv routing is
    self-validated HERE: both an `off` (pure XLA phase convs) and an
    `auto` (implicit-GEMM routed) step run with interleaved timing rounds
    in ONE process (the pool is time-shared — cross-run comparisons are
    noise; ROUND_NOTES), and the faster mode's number is reported. An
    explicit env value is respected and measured alone.

    Raises on OOM so the caller can retry smaller (all per-attempt device
    buffers go out of scope on failure).
    """
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    patch = (96, 96, 96)
    margin = 24  # margin feeds fused rotation/zoom, like production
    margin_shape = tuple(p + 2 * margin for p in patch)
    num_classes = 8

    # SEGMANTIC_BENCH_ARCH=segresnet benches the second architecture with
    # the same production step (train(arch=...) defaults); the driver's
    # flagship number is the default UNet
    arch = os.environ.get("SEGMANTIC_BENCH_ARCH", "unet").lower()
    if arch == "segresnet":
        from segmantic_tpu.models.segresnet import SegResNet

        model = SegResNet(
            spatial_dims=3,
            in_channels=1,
            out_channels=num_classes,
            init_filters=8,
            blocks_down=(1, 2, 2, 4),
            blocks_up=(1, 1, 1),
        )
    elif arch == "unetr":
        from segmantic_tpu.models.unetr import UNETR

        model = UNETR(in_channels=1, out_channels=num_classes)
    else:
        model = UNet(
            spatial_dims=3,
            in_channels=1,
            out_channels=num_classes,
            channels=(16, 32, 64, 128, 256),
            strides=(2, 2, 2, 2),
            num_res_units=2,
        )

    mesh = make_mesh()
    n_chips = mesh.devices.size

    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + patch + (1,), jnp.float32), training=False
    )
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    host_bstats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )

    aug_cfg = AugmentConfig(spatial=True, intensity=True)

    rng = np.random.default_rng(0)
    image = rng.standard_normal((batch,) + margin_shape + (1,)).astype(np.float32)
    label = rng.integers(0, num_classes, (batch,) + margin_shape).astype(np.uint8)
    # production wire dtypes (train() stages bf16 images / uint8 labels
    # when mixed_precision; the step consumes the compact wire directly)
    image_d = jax.device_put(
        image.astype(jnp.bfloat16), batch_sharding(mesh, image.ndim)
    )
    label_d = jax.device_put(label, batch_sharding(mesh, label.ndim))

    env_mode = os.environ.get("SEGMANTIC_PHASE_GEMM")
    modes = [env_mode]
    if env_mode is None and jax.default_backend() == "tpu":
        modes = ["off", "auto"]

    variants = {}
    try:
        for mode in modes:
            if mode is not None:
                os.environ["SEGMANTIC_PHASE_GEMM"] = mode
            # fresh donated state chain per variant (the step consumes its
            # device params); env is read at trace time, so set it before
            # the compile/warmup call
            params = replicate(
                mesh, jax.tree_util.tree_map(jnp.asarray, host_params)
            )
            batch_stats = replicate(
                mesh, jax.tree_util.tree_map(jnp.asarray, host_bstats)
            )
            opt_state = replicate(mesh, opt.init(params))
            step = make_train_step(
                model, opt, aug_cfg, patch, mixed_precision=True
            )
            state = [params, batch_stats, opt_state, jax.random.key(0)]
            loss = step(
                state[0], state[1], state[2], image_d, label_d, state[3]
            )
            state[0], state[1], state[2], loss = loss
            float(loss)  # full sync (device-to-host) before timing
            variants[mode or "env"] = (step, state)
    finally:
        # an OOM retry at a smaller batch must re-enter the dual-mode A/B
        if env_mode is None:
            os.environ.pop("SEGMANTIC_PHASE_GEMM", None)

    # the TPU pool is time-shared: take the best of several timing rounds,
    # INTERLEAVED across variants so they see the same pool conditions.
    # NOTE: end each round with a host transfer — through the remote-TPU
    # tunnel block_until_ready alone does not reliably fence execution.
    steps, rounds = 4, 3
    best_dt = {name: float("inf") for name in variants}
    for _ in range(rounds):
        for name, (step, state) in variants.items():
            params, batch_stats, opt_state, key = state
            t0 = time.perf_counter()
            for _ in range(steps):
                key, sub = jax.random.split(key)
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, image_d, label_d, sub
                )
            float(loss)  # blocks until the chain of steps has executed
            best_dt[name] = min(best_dt[name], time.perf_counter() - t0)
            state[0], state[1], state[2], state[3] = (
                params, batch_stats, opt_state, key,
            )

    voxels_per_step = batch * int(np.prod(patch))
    per_mode = {
        name: round(voxels_per_step * steps / dt / n_chips, 1)
        for name, dt in best_dt.items()
    }
    winner = max(per_mode, key=per_mode.get)

    # auditable utilization: analytic USEFUL FLOPs (model fwd+bwd + the
    # augmentation banded matmuls; redundant/structural-zero work in the
    # phase rewrites is NOT credited) over wall time vs the v5e bf16 peak.
    # Per-arch analytic counts live in utils/flops.py (unet/segresnet/unetr).
    from segmantic_tpu.utils.flops import (
        TPU_V5E_BF16_PEAK,
        flagship_step_flops,
    )

    flops = flagship_step_flops(
        batch, patch, margin, num_classes, arch=arch, aug_cfg=aug_cfg
    )
    step_time = best_dt[winner] / steps  # raw winning wall time per step
    mfu = {
        "step_flops": round(flops["step"] / 1e9, 1),  # GFLOP, fwd+bwd+aug
        "mfu_pct": round(
            flops["step"] / step_time / (n_chips * TPU_V5E_BF16_PEAK) * 100,
            2,
        ),
        "mfu_model_pct": round(
            flops["model_fwd_bwd"]
            / step_time
            / (n_chips * TPU_V5E_BF16_PEAK)
            * 100,
            2,
        ),
    }
    if arch != "unet":
        mfu["arch"] = arch
    return per_mode[winner], winner, per_mode, mfu


def main() -> None:
    last_err = None
    arch = os.environ.get("SEGMANTIC_BENCH_ARCH", "unet").lower()
    batches = (128, 96, 64)
    if arch == "unetr":
        # measured HBM ladder (r5, lane packing on): b16 needs ~18.5G >
        # 15.75G usable; b12 fits but is slower per voxel (36.8M) than b8
        # (40.1M — compute-bound, exp/unetr_pack_ab.py), so probe 16 in
        # case the pool's HBM grows, then land on the measured optimum 8.
        # The generic 128..32 rungs can never fit (the ViT + f=16 decoder
        # at b32 wants >4x the chip) and each failed AOT compile of the
        # 12-layer graph costs minutes through the tunnel.
        batches = (16, 8)
    elif arch != "unet":
        batches = (128, 96, 64, 32, 16, 8)
    if os.environ.get("SEGMANTIC_BENCH_BATCH"):  # skip the OOM ladder
        batches = (int(os.environ["SEGMANTIC_BENCH_BATCH"]),)
    for batch in batches:
        try:
            vox_per_sec_per_chip, mode, per_mode, mfu = run(batch)
            break
        except Exception as e:  # OOM -> retry smaller; match the XLA OOM
            # wordings only (a generic substring like 'memory' would
            # swallow unrelated failures and silently degrade the batch):
            # RESOURCE_EXHAUSTED (runtime) / "Ran out of memory" (the
            # AOT compile-time HBM error through the tunnel)
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "Ran out of memory" not in str(e)):
                raise
            print(f"batch {batch} did not fit, retrying smaller: "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
            last_err = e
    else:
        raise last_err

    result = {
        "metric": "train_labeled_voxels_per_sec_per_chip",
        "value": round(vox_per_sec_per_chip, 1),
        "unit": "voxels/s/chip",
        "vs_baseline": round(vox_per_sec_per_chip / 50000.0, 3),
        **mfu,
    }
    if len(per_mode) > 1:  # record the routing self-validation outcome
        result["phase_gemm"] = mode
        result["phase_gemm_modes"] = per_mode
    if batch != batches[0]:  # make a silent OOM fallback visible to the driver
        result["batch"] = batch
        result["oom_fallback"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
