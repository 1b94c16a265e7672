"""Real (interleaved best-of) cost split of the batch-32 production train
step: full step vs augmentation off, and augmentation alone vs its
image-only half — is the label NN path worth attacking?

Run: python exp/step_ablate.py
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
    import optax

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.augment import AugmentConfig, augment_batch
    from segmantic_tpu.train.trainer import make_train_step

    import sys as _sys
    B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 32
    S, C = 96, 8
    margin = 24
    M = S + 2 * margin
    rng = np.random.default_rng(0)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=C,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, S, S, S, 1), jnp.float32),
                           training=False)
    opt = optax.adam(1e-4)
    cfg = AugmentConfig(spatial=True, intensity=True)

    img = jnp.asarray(rng.standard_normal((B, M, M, M, 1)), jnp.bfloat16)
    lbl = jnp.asarray(rng.integers(0, C, (B, M, M, M)), jnp.uint8)
    img_p = jnp.asarray(rng.standard_normal((B, S, S, S, 1)), jnp.bfloat16)
    lbl_p = jnp.asarray(rng.integers(0, C, (B, S, S, S)), jnp.uint8)

    step_full = make_train_step(model, opt, cfg, (S,) * 3,
                                mixed_precision=True)
    step_noaug = make_train_step(
        model, opt, AugmentConfig(spatial=False, intensity=False),
        (S,) * 3, mixed_precision=True)

    aug_j = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg, (S,) * 3))
    cfg_sp = AugmentConfig(spatial=True, intensity=False)
    cfg_in = AugmentConfig(spatial=False, intensity=True)
    aug_sp_j = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg_sp, (S,) * 3))
    aug_in_j = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg_in, (S,) * 3))

    # image-only: run the same augment but with a 1-voxel dummy... not
    # representable; instead time the label-free spatial path by feeding
    # the label as a single-slice dummy is shape-invalid — so compare
    # aug(image+label) with aug(image+image-as-label-skipped) via a config
    # that is identical; the label share is aug_j - aug_img where aug_img
    # reuses the image pipeline only:
    from segmantic_tpu.ops.shear_resample import rotate_zoom_shear
    from segmantic_tpu.train.augment import _random_spatial_params

    def aug_img_only(i, k):
        def one(im, kk):
            angles, zoom = _random_spatial_params(kk, cfg, 3)
            return rotate_zoom_shear(
                im, angles, zoom, order=1, out_shape=(S,) * 3,
                angle_max=cfg.rotate_range,
                zoom_min=min(cfg.zoom_range[0], 1.0), bf16=True,
            )
        keys = jax.random.split(k, i.shape[0])
        return jax.vmap(one)(jnp.moveaxis(i, -1, 1), keys)

    aug_img_j = jax.jit(aug_img_only)

    def fresh():  # donated argnums: every consumer needs its own copy
        p = jax.tree_util.tree_map(jnp.copy, variables["params"])
        bs = jax.tree_util.tree_map(jnp.copy, variables.get("batch_stats", {}))
        return [p, bs, opt.init(p)]

    state = {"full": fresh(), "noaug": fresh()}

    def run_full():
        p, bs, o = state["full"]
        p, bs, o, loss = step_full(p, bs, o, img, lbl, jax.random.key(1))
        state["full"] = [p, bs, o]
        return loss

    def run_noaug():
        p, bs, o = state["noaug"]
        p, bs, o, loss = step_noaug(p, bs, o, img_p, lbl_p, jax.random.key(1))
        state["noaug"] = [p, bs, o]
        return loss

    def run_aug():
        i, l = aug_j(img, lbl, jax.random.key(2))
        return i

    def run_aug_img():
        return aug_img_j(img, jax.random.key(2))

    def bench(fn, n=4, rounds=1):
        out = fn()
        float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    def run_aug_sp():
        i, l = aug_sp_j(img, lbl, jax.random.key(2))
        return i

    def run_aug_in():
        i, l = aug_in_j(img_p, lbl_p, jax.random.key(2))
        return i

    # dice share at this batch: fwd+bwd with the production phase dice vs
    # a mean-square stand-in
    from segmantic_tpu.ops import fast_conv, pallas_conv
    from segmantic_tpu.train.losses import dice_loss_phase

    def make_lag(use_dice):
        def lag(p, bs, im, lb):
            with pallas_conv.packed_routing(None):
                lb_ph = fast_conv.space_to_depth(lb[..., None])
                def f(pp):
                    out, _ = model.apply(
                        {"params": pp, "batch_stats": bs}, im,
                        training=True, mutable=["batch_stats"],
                        phase_logits=True,
                    )
                    if use_dice:
                        return dice_loss_phase(out, lb_ph)
                    return jnp.mean(jnp.square(out.astype(jnp.float32)))
                return jax.value_and_grad(f)(p)
        return jax.jit(lag)

    lag_dice = make_lag(True)
    lag_sq = make_lag(False)
    pcopy = jax.tree_util.tree_map(jnp.copy, variables["params"])
    bs0 = variables.get("batch_stats", {})

    def run_lag_dice():
        return lag_dice(pcopy, bs0, img_p, lbl_p)[0]

    def run_lag_sq():
        return lag_sq(pcopy, bs0, img_p, lbl_p)[0]

    timers = {"step_full": run_full, "step_noaug": run_noaug,
              "aug": run_aug, "aug_img": run_aug_img,
              "aug_spatial": run_aug_sp, "aug_intensity": run_aug_in,
              "lag_dice": run_lag_dice, "lag_sq": run_lag_sq}
    for fn in timers.values():
        fn()  # compile
    best = {k: float("inf") for k in timers}
    for _ in range(3):
        for k, fn in timers.items():
            best[k] = min(best[k], bench(fn))
    for k, v in best.items():
        print(f"{k:>10s}: {v*1e3:8.1f} ms")
    print(f"aug share of step:   {(best['step_full']-best['step_noaug'])*1e3:7.1f} ms")
    print(f"aug standalone:      {best['aug']*1e3:7.1f} ms")
    print(f"aug label share:     {(best['aug']-best['aug_img'])*1e3:7.1f} ms")
    print(f"dice in-graph:       {(best['lag_dice']-best['lag_sq'])*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
