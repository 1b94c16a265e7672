"""Production-step A/B of the dice softmax-shift granularity: the bench.py
train step (fused augmentation + fwd/bwd + phase-mm dice + Adam, bf16/u8
wire) at the bench batch, SEGMANTIC_DICE_MAX=group vs sample, interleaved
in one process (time-shared pool). Each variant keeps its own donated
state chain.

The stabilizer `m = reduce_max(xp, lanes)` is ~5 ms of the 26 ms in-graph
dice at b96 (HLO-ranked, ROUND_NOTES r4); the "sample" variant reduces to
one scalar per sample — same full-tensor read, but a scalar broadcast in
the subtract and a 453 MB -> 384 B residual. Exact softmax either way
(any per-group-constant shift cancels); see losses.py::_dice_phase_fwd.

Run: python exp/dice_max_ab.py [BATCH [STEPS_PER_ROUND [MODE MODE...]]]
(default modes: group sample)

MEASURED (r5, v5e, b96, 4 rounds x 6 steps interleaved): group 360.70 ms
(235.5 Mvox/s) vs sample 359.15 ms (236.5 Mvox/s) = 1.00x, losses
bit-identical 0.87503. NEGATIVE RESULT: the per-lane-group reduce_max is
fused into the same read pass as the subtract either way — the ~5 ms the
HLO cost model attributed to it (ROUND_NOTES r4) is not removable wall
time. Default stays "group"; see losses.py::_dice_phase_fwd.
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


def main():
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.parallel.mesh import make_mesh, replicate
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    print("backend:", jax.default_backend(), flush=True)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    modes = tuple(sys.argv[3:]) or ("group", "sample")

    patch = (96, 96, 96)
    margin = 24
    margin_shape = tuple(p + 2 * margin for p in patch)
    num_classes = 8
    model = UNet(spatial_dims=3, in_channels=1, out_channels=num_classes,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    mesh = make_mesh()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + patch + (1,), jnp.float32),
        training=False)
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    aug_cfg = AugmentConfig(spatial=True, intensity=True)

    rng = np.random.default_rng(0)
    image = rng.standard_normal((batch,) + margin_shape + (1,)).astype(np.float32)
    label = rng.integers(0, num_classes, (batch,) + margin_shape).astype(np.uint8)
    image_d = jax.device_put(jnp.asarray(image, jnp.bfloat16))
    label_d = jax.device_put(jnp.asarray(label))

    host_params = jax.tree.map(np.asarray, variables["params"])
    host_bstats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    def make(mode):
        os.environ["SEGMANTIC_DICE_MAX"] = mode
        step = make_train_step(model, opt, aug_cfg, patch,
                               mixed_precision=True)
        params = replicate(mesh, jax.tree.map(jnp.asarray, host_params))
        bstats = replicate(mesh, jax.tree.map(jnp.asarray, host_bstats))
        opt_state = replicate(mesh, opt.init(params))
        state = [params, bstats, opt_state, jax.random.key(7)]

        def run_once():
            p, b, o, k = state
            k, sub = jax.random.split(k)
            p, b, o, loss = step(p, b, o, image_d, label_d, sub)
            state[0], state[1], state[2], state[3] = p, b, o, k
            return loss

        float(run_once())
        return run_once

    runners = {m: make(m) for m in modes}

    best = {m: float("inf") for m in modes}
    losses = {}
    for _ in range(4):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            for _ in range(n_steps):
                loss = fn()
            losses[name] = float(loss)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n_steps)
    vox = batch * int(np.prod(patch))
    base = modes[0]
    parts = [
        f"{m} {best[m]*1e3:7.2f} ms ({vox/best[m]/1e6:6.1f} Mvox/s)"
        for m in modes
    ]
    speed = " ".join(
        f"{base}/{m} {best[base]/best[m]:4.2f}x" for m in modes[1:]
    )
    lossstr = " ".join(f"{m} {losses[m]:.5f}" for m in modes)
    print(f"B={batch}: step " + "  ".join(parts) + f"  {speed} | loss "
          + lossstr, flush=True)


if __name__ == "__main__":
    main()
