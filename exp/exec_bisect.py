"""Why is the executor's XLA path slower than flax? Bisect + cost diff.

Variants (interleaved, same session):
  flax    — module.apply eval
  fb      — executor fallback wrapper (module.apply inside) — sanity 1.0x
  xla     — executor XLA path, packing disabled
Prints XLA cost_analysis (flops/bytes) for flax vs xla.
Run: SEGMANTIC_PACKED_EVAL_MAX=0 python exp/exec_bisect.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ["SEGMANTIC_PACKED_EVAL_MAX"] = "0"


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

    print("backend:", jax.default_backend(), flush=True)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    B = 8
    x = jnp.zeros((B, 96, 96, 96, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], training=False)

    @jax.jit
    def flax_fwd(v, a):
        return model.apply(v, a.astype(jnp.bfloat16),
                           training=False).astype(jnp.float32)

    xla_fwd = ex.make_eval_forward(model, jnp.bfloat16)

    # fallback wrapper (module.apply inside executor-shaped jit)
    sup = ex.executor_supported
    ex.executor_supported = lambda m: False
    fb_fwd = ex.make_eval_forward(model, jnp.bfloat16)
    ex.executor_supported = sup

    for name, fn in (("flax", flax_fwd), ("xla", xla_fwd)):
        c = fn.lower(variables, x).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"{name}: flops={ca.get('flops', 0)/1e9:.1f}G "
              f"bytes={ca.get('bytes accessed', 0)/1e6:.0f}MB", flush=True)

    res = {}
    for tag, fn in (("flax", flax_fwd), ("fb", fb_fwd), ("xla", xla_fwd),
                    ("flax2", flax_fwd), ("fb2", fb_fwd), ("xla2", xla_fwd)):
        t = bench(fn, (variables, x))
        res[tag] = t
        print(f"{tag:6s} {t*1e3:7.2f} ms", flush=True)
    f = min(res["flax"], res["flax2"])
    print(f"fb {min(res['fb'], res['fb2'])/f:.3f}x of flax;  "
          f"xla {min(res['xla'], res['xla2'])/f:.3f}x of flax", flush=True)


if __name__ == "__main__":
    main()
