"""Compile (AOT) the batch-32 train fwd+bwd with dice vs mse loss and diff
the optimized HLO: which extra copies/transposes/fusions does dice force?

No timing — pure compiled-artifact analysis, immune to the time-shared
pool's noise. Prints:
  - cost_analysis (flops, bytes accessed) for both
  - every fusion/copy/transpose touching >= 100 MB in dice-but-not-mse
Run: python exp/dice_hlo.py [out_dir]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def byte_size(shape: str) -> int:
    """Rough byte size of an HLO shape string like f32[32,96,96,96,8]{...}."""
    total = 0
    for m in re.finditer(r"(f32|bf16|s32|u8|s8|pred|f16|u32)\[([0-9,]*)\]", shape):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                      "u8": 1, "s8": 1, "pred": 1}[dt]
    return total


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dice_hlo")
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.ops import pallas_conv
    from segmantic_tpu.train.losses import dice_loss

    B, S, C = 32, 96, 8
    dt = jnp.bfloat16
    model = UNet(spatial_dims=3, in_channels=1, out_channels=C,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, S, S, S, 1), jnp.float32),
                           training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    image = jnp.zeros((B, S, S, S, 1), dt)
    label = jnp.zeros((B, S, S, S), jnp.int32)

    def make_lag(loss_fn):
        def lag(p, bs, im, lb):
            with pallas_conv.packed_routing(None):
                def f(pp):
                    out, mut = model.apply(
                        {"params": pp, "batch_stats": bs}, im,
                        training=True, mutable=["batch_stats"],
                    )
                    return loss_fn(out, lb), 0.0
                (loss, _), grads = jax.value_and_grad(f, has_aux=True)(p)
            return loss, grads
        return jax.jit(lag)

    lag_dice = make_lag(dice_loss)
    lag_sq = make_lag(lambda o, l: jnp.mean(jnp.square(o.astype(jnp.float32))))

    texts = {}
    for name, fn in [("dice", lag_dice), ("sq", lag_sq)]:
        compiled = fn.lower(params, batch_stats, image, label).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"{name}: flops={ca.get('flops', 0)/1e12:.2f} T  "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB")
        txt = compiled.as_text()
        (out_dir / f"{name}.hlo").write_text(txt)
        texts[name] = txt

    # Top-level instructions with shapes >= 100 MB, per graph
    def big_ops(txt, min_bytes=100 * 1024 * 1024):
        ops = {}
        for line in txt.splitlines():
            line = line.strip()
            m = re.match(r"%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|\S+))\s+(\w+)\(", line)
            if not m:
                continue
            name, shape, op = m.groups()
            b = byte_size(shape)
            if b >= min_bytes:
                key = (op, shape.split("{")[0])
                ops.setdefault(key, []).append(name)
        return ops

    for name in ("dice", "sq"):
        print(f"\n=== {name}: ops with output >= 100 MB ===")
        counts = {}
        for (op, shape), names in sorted(big_ops(texts[name]).items()):
            counts[(op, shape)] = len(names)
        for (op, shape), cnt in sorted(counts.items(),
                                       key=lambda kv: -byte_size(kv[0][1])):
            print(f"  {cnt:2d}x {op:12s} {shape}  "
                  f"({byte_size(shape)/1e6:.0f} MB)")
    print(f"\nHLO dumped to {out_dir}/dice.hlo and sq.hlo")


if __name__ == "__main__":
    main()
