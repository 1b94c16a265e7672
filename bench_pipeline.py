"""Benchmark: TRUE-PIPELINE training throughput (labeled voxels/sec/chip).

Unlike ``bench.py`` (which times the device program on a pre-staged batch),
this measures the production ``train()`` inner loop verbatim — VolumeCache
(built once from NIfTI files through the default preprocessing, amortized
and untimed, like a real run) → class-balanced PatchSampler crops →
PrefetchLoader (background-thread double buffering) → ``put_batch``
host-to-device transfer → fused-augmentation train step — so host sampling
and H2D transfer are inside the timed region. Reference hot loop:
src/segmantic/seg/monai_unet.py:339-348 with CacheDataset :264-290.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} against the
50k labeled voxels/sec/chip north-star.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def make_dataset(root: Path, n_vols: int, shape, num_classes: int) -> list:
    from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
    from segmantic_tpu.io.nifti import write_volume

    rng = np.random.default_rng(0)
    aff = affine_from_spacing_origin((1.0, 1.0, 1.0))
    files = []
    for i in range(n_vols):
        img = rng.standard_normal(shape).astype(np.float32)
        lbl = rng.integers(0, num_classes, shape).astype(np.uint8)
        ip, lp = root / f"img{i}.nii.gz", root / f"lbl{i}.nii.gz"
        write_volume(ip, Volume(data=img[None], affine=aff))
        write_volume(lp, Volume(data=lbl[None], affine=aff.copy()))
        files.append({"image": ip, "label": lp})
    return files


def main() -> None:
    import jax

    from segmantic_tpu.data.cache import PatchSampler, PrefetchLoader, VolumeCache
    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.parallel.mesh import make_mesh, put_batch, replicate
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import default_preprocessing, make_train_step

    import jax.numpy as jnp

    patch = (96, 96, 96)
    batch = 8
    num_classes = 8
    margin = max(patch) // 4  # production margin for fused rotation/zoom

    with tempfile.TemporaryDirectory() as td:
        files = make_dataset(Path(td), 4, (160, 160, 160), num_classes)
        pre = default_preprocessing(["image", "label"], ())
        cache = VolumeCache(files, pre, num_classes)  # built once, untimed

        sampler = PatchSampler(
            cache, patch_size=list(patch), batch_size=batch, num_samples=4,
            margin=margin, seed=0, image_wire_dtype=jnp.bfloat16,
        )
        loader = PrefetchLoader(sampler)

        mesh = make_mesh()
        n_chips = mesh.devices.size
        model = UNet(
            spatial_dims=3, in_channels=1, out_channels=num_classes,
            channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
            num_res_units=2,
        )
        variables = model.init(
            jax.random.key(0), jnp.zeros((1,) + patch + (1,), jnp.float32),
            training=False,
        )
        opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
        params = replicate(mesh, variables["params"])
        batch_stats = replicate(mesh, variables.get("batch_stats", {}))
        opt_state = replicate(mesh, opt.init(params))
        aug_cfg = AugmentConfig(spatial=True, intensity=True)
        step = make_train_step(model, opt, aug_cfg, patch, mixed_precision=True)
        key = jax.random.key(0)

        # warmup: compile + fill the prefetch queue
        image_b, label_b = loader.next()
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            put_batch(mesh, image_b), put_batch(mesh, label_b), key,
        )
        float(loss)

        steps, rounds = 4, 3
        best_dt = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(steps):
                image_b, label_b = loader.next()  # host sampling (timed)
                image_d = put_batch(mesh, image_b)  # H2D (timed)
                label_d = put_batch(mesh, label_b)
                key, sub = jax.random.split(key)
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, image_d, label_d, sub
                )
            float(loss)  # host-transfer fence (tunnel-safe)
            best_dt = min(best_dt, time.perf_counter() - t0)
        loader.stop()

    voxels = batch * int(np.prod(patch)) * steps
    vox_per_sec_per_chip = voxels / best_dt / n_chips
    print(
        json.dumps(
            {
                "metric": "pipeline_train_voxels_per_sec_per_chip",
                "value": round(vox_per_sec_per_chip, 1),
                "unit": "voxels/s/chip",
                "vs_baseline": round(vox_per_sec_per_chip / 50000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
