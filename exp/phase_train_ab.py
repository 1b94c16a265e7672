"""Train-step A/B: phase-space top decoder stage on vs off (flagship).

fwd+bwd at 8x96^3 bf16, interleaved. Run: python exp/phase_train_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench(fn, args, n=10, rounds=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.losses import dice_loss

    print("backend:", jax.default_backend(), flush=True)
    B = 8
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    x32 = jnp.zeros((B, 96, 96, 96, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x32[:1], training=False)
    x = x32.astype(jnp.bfloat16)
    label = jnp.zeros((B, 96, 96, 96), jnp.int32)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    def train_loss(p, b, a):
        out, _ = model.apply({"params": p, "batch_stats": b}, a,
                             training=True, mutable=["batch_stats"])
        return dice_loss(out, label)

    def make(tag):
        os.environ["SEGMANTIC_PHASE_TOP"] = tag
        fwd = jax.jit(lambda v, a: model.apply(v, a, training=False))
        fwdbwd = jax.jit(lambda p, b, a: jax.grad(train_loss)(p, b, a))
        # force trace under the env setting
        fwd(variables, x)
        fwdbwd(params, bstats, x)
        return fwd, fwdbwd

    fwd_off, fb_off = make("off")
    fwd_on, fb_on = make("on")

    res = {}
    for rep in ("", "2"):
        for tag, fwd, fb in (("off", fwd_off, fb_off), ("on", fwd_on, fb_on)):
            tf = bench(fwd, (variables, x))
            tb = bench(fb, (params, bstats, x), n=5)
            res[tag + "f" + rep] = tf
            res[tag + "b" + rep] = tb
            print(f"{tag+rep:5s} fwd {tf*1e3:7.2f} ms  fwd+bwd {tb*1e3:7.2f} ms",
                  flush=True)
    ff = min(res["offf"], res["offf2"]); fn_ = min(res["onf"], res["onf2"])
    bf = min(res["offb"], res["offb2"]); bn = min(res["onb"], res["onb2"])
    print(f"best-of: fwd {ff*1e3:.2f} -> {fn_*1e3:.2f} ({ff/fn_:.2f}x)  "
          f"fwd+bwd {bf*1e3:.2f} -> {bn*1e3:.2f} ({bf/bn:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
# PHASE_MAX sweep entry: python exp/phase_train_ab.py (env SEGMANTIC_PHASE_MAX)
