"""A/B: phase-major Dice (no final depth-to-space) vs full-res Dice.

Full production train step, flagship shapes, interleaved.
Run: python exp/phasedice_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    print("backend:", jax.default_backend(), flush=True)
    B, patch = 8, (96, 96, 96)
    margin = tuple(p + 48 for p in patch)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1,) + patch + (1,)), training=False)
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B,) + margin + (1,)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, 8, (B,) + margin), jnp.int32)

    def make(tag):
        os.environ["SEGMANTIC_PHASE_DICE"] = tag
        step = make_train_step(
            model, opt, AugmentConfig(spatial=True, intensity=True), patch,
            mixed_precision=True)
        # fresh copies per variant: the step donates its state buffers
        p = jax.tree_util.tree_map(jnp.array, variables["params"])
        b = jax.tree_util.tree_map(jnp.array, variables.get("batch_stats", {}))
        o = opt.init(p)
        key = jax.random.key(1)
        p, b, o, loss = step(p, b, o, img, lbl, key)  # compile
        float(loss)
        return step, (p, b, o)

    s_off, st_off = make("off")
    s_on, st_on = make("on")

    def bench(step, state, n=8, rounds=3):
        # donated buffers: work on copies so the next rep can reuse `state`
        p, b, o = jax.tree_util.tree_map(jnp.array, state)
        key = jax.random.key(2)
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                key, sub = jax.random.split(key)
                p, b, o, loss = step(p, b, o, img, lbl, sub)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    res = {}
    for rep in ("", "2"):
        for tag, s, st in (("off", s_off, st_off), ("on", s_on, st_on)):
            t = bench(s, st)
            res[tag + rep] = t
            print(f"{tag+rep:5s} {t*1e3:7.2f} ms/step", flush=True)
    o = min(res["off"], res["off2"])
    n_ = min(res["on"], res["on2"])
    print(f"best-of: {o*1e3:.2f} -> {n_*1e3:.2f} ms ({o/n_:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
