"""UNETR feature_size A/B on TPU: 16 (MONAI default) vs 32.

The UNETR bench is bound by its full-resolution feature_size=16 stages:
C=16 on the 128-lane minor stores 8x padded (BASELINE r4 row), so both
HBM and the conv lowering run at 1/8 density. feature_size=32 quadruples
lane density at 2x the FLOPs — on padding-bound stages that can be a net
WIN, and it is the kind of TPU-first tuning guidance this repo exists to
measure. Production train step (fused aug + fwd/bwd + Adam, bf16), both
variants interleaved in one process at batch 8 x 96^3.

RESULT (TPU v5e, b8 x 96^3, r4): **f16 WINS — f32 is 0.85x** (f16 314.7 ms
/ 22.5 Mvox/s vs f32 370.8 ms / 19.1 Mvox/s, warm losses matching).
The 4x denser lanes do NOT buy back the 2x FLOPs/bytes: the 8x lane
padding is an HBM-CAPACITY problem (it caps batch at 8), not a
wall-clock one — XLA's conv time tracks logical work here. The MONAI
default feature_size=16 is also the TPU-right choice.

Run: python exp/unetr_feature_ab.py [BATCH [STEPS]]
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

    from segmantic_tpu.models.unetr import UNETR
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    print("backend:", jax.default_backend(), flush=True)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    patch = (96, 96, 96)
    margin_shape = tuple(p + 48 for p in patch)
    num_classes = 8

    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.standard_normal((batch,) + margin_shape + (1,)).astype(jnp.bfloat16)
    )
    lbl = jax.device_put(
        rng.integers(0, num_classes, (batch,) + margin_shape).astype(np.uint8)
    )
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    aug_cfg = AugmentConfig(spatial=True, intensity=True)

    states, steps_fn = {}, {}
    for f in (16, 32):
        model = UNETR(in_channels=1, out_channels=num_classes, feature_size=f)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1,) + patch + (1,), jnp.float32),
            training=False,
        )
        step = make_train_step(model, opt, aug_cfg, patch, mixed_precision=True)
        params = variables["params"]
        state = [params, variables.get("batch_stats", {}),
                 opt.init(params), jax.random.key(0)]
        out = step(state[0], state[1], state[2], img, lbl, state[3])
        state[0], state[1], state[2], loss = out
        float(loss)
        states[f], steps_fn[f] = state, step
        print(f"f={f}: compiled, warm loss {float(loss):.5f}", flush=True)

    best = {f: float("inf") for f in states}
    for _ in range(3):
        for f, state in states.items():
            step = steps_fn[f]
            params, bstats, opt_state, key = state
            t0 = time.perf_counter()
            for _ in range(n_steps):
                key, sub = jax.random.split(key)
                params, bstats, opt_state, loss = step(
                    params, bstats, opt_state, img, lbl, sub
                )
            float(loss)
            best[f] = min(best[f], (time.perf_counter() - t0) / n_steps)
            state[0], state[1], state[2], state[3] = params, bstats, opt_state, key
    vox = batch * int(np.prod(patch))
    print(
        f"B={batch}: f16 {best[16]*1e3:.1f} ms ({vox/best[16]/1e6:.1f} Mvox/s)"
        f"  f32 {best[32]*1e3:.1f} ms ({vox/best[32]/1e6:.1f} Mvox/s)"
        f"  f16/f32 {best[16]/best[32]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
