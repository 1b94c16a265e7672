"""Cumulative-prefix timing of the executor eval graph: where do ms go?

Builds partial forwards (stop after unit K) and times each; deltas give
per-stage cost in-graph (XLA may fuse differently when truncated — treat
as a guide). Run: python exp/exec_stages.py [max]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
if len(sys.argv) > 1:
    os.environ["SEGMANTIC_PACKED_EVAL_MAX"] = sys.argv[1]


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

    from segmantic_tpu.infer import executor as ex
    from segmantic_tpu.models.unet import UNet

    print("backend:", jax.default_backend(),
          "max:", os.environ.get("SEGMANTIC_PACKED_EVAL_MAX", "dflt"),
          flush=True)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    B = 8
    x = jnp.zeros((B, 96, 96, 96, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], training=False)

    channels = model.channels
    strides = model.strides
    nres = model.num_res_units
    act = model.act.upper()

    def make_partial(n_units):
        @jax.jit
        def fwd(variables, xin):
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            counters = {"ResidualUnit": 0, "ConvUnit": 0}

            def take(kind):
                name = f"{kind}_{counters[kind]}"
                counters[kind] += 1
                return params[name], stats.get(name, {})

            done = 0
            y = xin.astype(jnp.bfloat16)
            skips = []
            for c, s in zip(channels[:-1], strides):
                p, t = take("ResidualUnit")
                y = ex._residual_unit(y, p, t, feats=c, strides=s,
                                      subunits=nres, last_conv_only=False,
                                      act=act, interpret=False)
                skips.append(y)
                done += 1
                if done >= n_units:
                    return y
            p, t = take("ResidualUnit")
            y = ex._residual_unit(y, p, t, feats=channels[-1], strides=1,
                                  subunits=nres, last_conv_only=False,
                                  act=act, interpret=False)
            done += 1
            if done >= n_units:
                return y
            for level in reversed(range(len(strides))):
                y = jnp.concatenate([skips[level], y], axis=-1)
                is_top = level == 0
                feats = model.out_channels if is_top else channels[level - 1]
                p, t = take("ConvUnit")
                if ex._phase_stage_ok(model, y.shape, feats, strides[level]):
                    p2, t2 = take("ResidualUnit")
                    y = ex._phase_stage(y, p, t, p2, t2, feats=feats,
                                        subunits=1, last_conv_only=is_top,
                                        act=act)
                else:
                    y = ex._conv_unit(y, p, t, strides=strides[level],
                                      transposed=True, conv_only=False,
                                      act=act)
                    p, t = take("ResidualUnit")
                    y = ex._residual_unit(y, p, t, feats=feats, strides=1,
                                          subunits=1, last_conv_only=is_top,
                                          act=act, interpret=False)
                done += 1
                if done >= n_units:
                    return y
            return y

        return fwd

    labels = ["e0", "e1", "e2", "e3", "bot", "d3", "d2", "d1", "d0"]
    prev = 0.0
    for k in range(1, 10):
        t = bench(make_partial(k), (variables, x))
        print(f"after {labels[k-1]:4s} {t*1e3:7.2f} ms  (delta "
              f"{(t-prev)*1e3:6.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
