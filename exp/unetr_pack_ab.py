"""Interleaved A/B: UNETR lane packing (SEGMANTIC_UNETR_PACK) off vs on.

r4 finding: UNETR's full-res feature_size=16 stages store 8x lane-padded
(bf16[8,96^3,16] costs 3.38G HBM), capping batch at 8 and throughput at
22.3M vox/s/chip. r5 packs the narrow regions into subpixel phase space
(models/unetr.py; exact — tests/models/test_unetr_pack.py).

Phase 1 (A/B): off vs on at the SAME batch, interleaved timing rounds in
ONE process (the pool is time-shared; cross-run numbers are noise).
Phase 2 (ceiling): packed-only ladder upward to find the new HBM ceiling.

Usage: python exp/unetr_pack_ab.py [ab_batch] [ladder batches...]
Defaults: ab_batch=8, ladder 64 48 32 16.

MEASURED (r5, v5e): b8 off 22.4M vox/s (316.2 ms) vs on 40.1M (176.7 ms)
= 1.79x, first-step losses bit-identical (0.87931); re-measured with the
phase-dice head 22.3M vs 39.2M = 1.76x. CAVEAT on the ladder: run it in
a FRESH process — after the A/B phase, leftover allocator state makes
b12-b32 report OOM even though b12 fits (compiled stats 12.92G temp +
1.34G args; a fresh b12 run executes at 36.8M vox/s, 288.7 ms/step —
slower per voxel than b8, so b8 stays the throughput point: packed UNETR
is compute-bound, no longer HBM-capacity-bound). b16 needs ~18.5G > the
~15.75G usable and genuinely does not fit.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

PATCH = (96, 96, 96)
MARGIN = 24
NUM_CLASSES = 8


def make_step_state(batch, image_d, label_d, pack: str):
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unetr import UNETR
    from segmantic_tpu.parallel.mesh import make_mesh, replicate
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    os.environ["SEGMANTIC_UNETR_PACK"] = pack  # read at trace time
    model = UNETR(in_channels=1, out_channels=NUM_CLASSES)
    mesh = make_mesh()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + PATCH + (1,), jnp.float32),
        training=False,
    )
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    params = replicate(mesh, variables["params"])
    batch_stats = replicate(mesh, variables.get("batch_stats", {}))
    opt_state = replicate(mesh, opt.init(params))
    step = make_train_step(
        model, opt, AugmentConfig(spatial=True, intensity=True), PATCH,
        mixed_precision=True,
    )
    state = [params, batch_stats, opt_state, jax.random.key(0)]
    out = step(state[0], state[1], state[2], image_d, label_d, state[3])
    state[0], state[1], state[2], loss = out
    float(loss)
    return step, state, float(loss)


def make_batch(batch):
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    margin_shape = tuple(p + 2 * MARGIN for p in PATCH)
    rng = np.random.default_rng(0)
    image = rng.standard_normal((batch,) + margin_shape + (1,)).astype(np.float32)
    label = rng.integers(0, NUM_CLASSES, (batch,) + margin_shape).astype(np.uint8)
    image_d = jax.device_put(
        image.astype(jnp.bfloat16), batch_sharding(mesh, image.ndim)
    )
    label_d = jax.device_put(label, batch_sharding(mesh, label.ndim))
    return image_d, label_d


def time_variants(variants, image_d, label_d, batch, steps=4, rounds=3):
    import jax

    best = {k: float("inf") for k in variants}
    for _ in range(rounds):
        for name, (step, state) in variants.items():
            params, batch_stats, opt_state, key = state
            t0 = time.perf_counter()
            for _ in range(steps):
                key, sub = jax.random.split(key)
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, image_d, label_d, sub
                )
            float(loss)  # host-transfer fence (tunnel rule)
            best[name] = min(best[name], time.perf_counter() - t0)
            state[:] = [params, batch_stats, opt_state, key]
    vox = batch * int(np.prod(PATCH)) * steps
    return {k: vox / dt for k, dt in best.items()}, {
        k: dt / steps * 1e3 for k, dt in best.items()
    }


def main():
    ab_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ladder = [int(a) for a in sys.argv[2:]] or [64, 48, 32, 16]

    image_d, label_d = make_batch(ab_batch)
    variants = {}
    losses = {}
    for pack in ("off", "on"):
        step, state, loss = make_step_state(ab_batch, image_d, label_d, pack)
        variants[pack] = (step, state)
        losses[pack] = loss
    vox_s, ms = time_variants(variants, image_d, label_d, ab_batch)
    print(f"[A/B b{ab_batch}] off {vox_s['off']/1e6:.1f}M vox/s "
          f"({ms['off']:.1f} ms) | on {vox_s['on']/1e6:.1f}M "
          f"({ms['on']:.1f} ms) | speedup {vox_s['on']/vox_s['off']:.2f}x "
          f"| first-step losses off={losses['off']:.5f} on={losses['on']:.5f}")
    del variants

    for batch in ladder:
        try:
            image_d, label_d = make_batch(batch)
            step, state, _ = make_step_state(batch, image_d, label_d, "on")
            vox_s, ms = time_variants(
                {"on": (step, state)}, image_d, label_d, batch
            )
            print(f"[packed b{batch}] {vox_s['on']/1e6:.1f}M vox/s "
                  f"({ms['on']:.1f} ms/step)")
        except Exception as e:
            if ("RESOURCE_EXHAUSTED" in str(e)
                    or "Ran out of memory" in str(e)):
                print(f"[packed b{batch}] OOM")
                continue
            raise


if __name__ == "__main__":
    main()
