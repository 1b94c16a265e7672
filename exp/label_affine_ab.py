"""A/B: label spatial augmentation — 9-pass one-hot NN shear chain vs ONE
composed-affine NN gather (VERDICT r3 #1a).

Both variants run the production label shapes (batch x (1,144^3) u8 margin
patches -> 96^3), vmapped over per-sample angles/zoom, interleaved timing
rounds in one process (the pool is time-shared). Also times the two inside
the FULL production train step (augment config flag), which is the number
that matters.

Usage: python exp/label_affine_ab.py [batch]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from segmantic_tpu.ops.shear_resample import (
    center_crop,
    rotate_zoom_nn_gather,
    rotate_zoom_shear,
)


def time_op(fn, args, steps=8, rounds=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    patch, margin = (96, 96, 96), 24
    mshape = tuple(p + 2 * margin for p in patch)

    rng = np.random.default_rng(0)
    lbl = jax.device_put(
        rng.integers(0, 8, (batch, 1) + mshape).astype(np.uint8)
    )
    angles = jax.device_put(
        rng.uniform(-0.4, 0.4, (batch, 3)).astype(np.float32)
    )
    zoom = jax.device_put(rng.uniform(0.8, 1.3, (batch,)).astype(np.float32))

    @jax.jit
    def chain(l, a, z):
        def one(l, a, z):
            return center_crop(
                rotate_zoom_shear(
                    l, a, z, order=0, out_shape=patch,
                    angle_max=0.4, zoom_min=0.8,
                ), patch,
            )
        return jax.vmap(one)(l, a, z)

    @jax.jit
    def direct(l, a, z):
        return jax.vmap(
            lambda l, a, z: rotate_zoom_nn_gather(l, a, z, patch)
        )(l, a, z)

    variants = {"chain": chain, "direct": direct}
    best = {}
    for _ in range(3):
        for name, fn in variants.items():
            dt = time_op(fn, (lbl, angles, zoom), steps=4, rounds=1)
            best[name] = min(best.get(name, float("inf")), dt)
    for name, dt in best.items():
        print(f"label-only {name}: {dt*1e3:.1f} ms/batch")
    print(f"label-only speedup: {best['chain']/best['direct']:.2f}x")

    # semantics: mismatch fraction on one sample (boundary rounding only)
    a = np.asarray(chain(lbl[:1], angles[:1], zoom[:1]))
    b = np.asarray(direct(lbl[:1], angles[:1], zoom[:1]))
    print(f"mismatch vs chain (random labels, upper bound): "
          f"{(a != b).mean():.4f}")

    # full production step A/B (the driver's number)
    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1,) + patch + (1,), jnp.float32),
                           training=False)
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    img_h = rng.standard_normal((batch,) + mshape + (1,)).astype(np.float32)
    lbl_h = rng.integers(0, 8, (batch,) + mshape).astype(np.uint8)
    img_d = jax.device_put(img_h.astype(jnp.bfloat16))
    lbl_d = jax.device_put(lbl_h)

    # host copies: the jitted step donates params/bstats/opt_state, so each
    # variant must device_put fresh buffers (jnp.asarray would alias the
    # first variant's donated arrays and fail)
    params_h = jax.tree_util.tree_map(np.asarray, variables["params"])
    bstats_h = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))

    states, steps_fn = {}, {}
    for name, flag in (("chain", False), ("direct", True)):
        cfg = AugmentConfig(spatial=True, intensity=True,
                            label_affine_gather=flag)
        step = make_train_step(model, opt, cfg, patch, mixed_precision=True)
        params = jax.tree_util.tree_map(jnp.asarray, params_h)
        bstats = jax.tree_util.tree_map(jnp.asarray, bstats_h)
        state = [params, bstats, opt.init(params), jax.random.key(0)]
        out = step(state[0], state[1], state[2], img_d, lbl_d, state[3])
        state[0], state[1], state[2], loss = out
        print(f"step[{name}] warm loss {float(loss):.5f}")
        states[name], steps_fn[name] = state, step

    nsteps, best_step = 4, {}
    for _ in range(3):
        for name, step in steps_fn.items():
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(nsteps):
                key, sub = jax.random.split(st[3])
                st[0], st[1], st[2], loss = step(
                    st[0], st[1], st[2], img_d, lbl_d, sub)
                st[3] = key
            float(loss)
            best_step[name] = min(
                best_step.get(name, float("inf")),
                (time.perf_counter() - t0) / nsteps)
    vox = batch * int(np.prod(patch))
    for name, dt in best_step.items():
        print(f"full step [{name}]: {dt*1e3:.1f} ms "
              f"({vox/dt/1e6:.1f} Mvox/s)")
    print(f"full-step speedup: {best_step['chain']/best_step['direct']:.3f}x")


if __name__ == "__main__":
    main()
