"""Noise-free step profile from the compiled HLO: rank instructions by the
XLA TPU cost model's estimated_cycles (written into backend_config), with
source attribution. Immune to the time-shared pool (exp/profile_step.py
caveat) — this is the compiler's own schedule estimate, not a timing.

Usage:
  python exp/hlo_cycles.py <file.hlo>        # analyze an existing dump
  python exp/hlo_cycles.py --step [B [S]]    # compile the production train
                                             # step (bench.py config) & rank
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def analyze(text: str, clock_ghz: float = 0.94, top: int = 30) -> None:
    """v5e TPU clock ~940 MHz."""
    rows = []
    for line in text.splitlines():
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not m:
            continue
        cycles = int(m.group(1))
        op_m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|\S+))\s+([\w\-]+)\(", line)
        src_m = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        opname_m = re.search(r'op_name="([^"]+)"', line)
        rows.append({
            "cycles": cycles,
            "name": op_m.group(1) if op_m else "?",
            "shape": (op_m.group(2).split("{")[0] if op_m else "?"),
            "op": op_m.group(3) if op_m else "?",
            "src": (f"{Path(src_m.group(1)).name}:{src_m.group(2)}"
                    if src_m else "?"),
            "op_name": opname_m.group(1) if opname_m else "?",
        })
    total = sum(r["cycles"] for r in rows)
    print(f"total estimated: {total/1e6:.1f} Mcycles "
          f"~= {total/clock_ghz/1e6:.1f} ms @ {clock_ghz} GHz "
          f"({len(rows)} costed instructions)")

    print(f"\n=== top {top} instructions ===")
    for r in sorted(rows, key=lambda r: -r["cycles"])[:top]:
        ms = r["cycles"] / clock_ghz / 1e6
        print(f"  {ms:7.2f} ms  {r['op']:<14s} {r['shape']:<34s} "
              f"{r['src']:<28s} {r['op_name'][:60]}")

    print("\n=== by source line (>= 1% of total) ===")
    by_src = defaultdict(int)
    for r in rows:
        by_src[r["src"]] += r["cycles"]
    for src, cyc in sorted(by_src.items(), key=lambda kv: -kv[1]):
        if cyc < total * 0.01:
            continue
        print(f"  {cyc/clock_ghz/1e6:7.2f} ms  {cyc/total*100:5.1f}%  {src}")

    print("\n=== by op type ===")
    by_op = defaultdict(int)
    for r in rows:
        by_op[r["op"]] += r["cycles"]
    for op, cyc in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {cyc/clock_ghz/1e6:7.2f} ms  {cyc/total*100:5.1f}%  {op}")


def compile_step(batch: int, s: int) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.trainer import make_train_step

    patch = (s, s, s)
    margin = 24
    mshape = tuple(p + 2 * margin for p in patch)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1,) + patch + (1,), jnp.float32),
                           training=False)
    opt = optax.adam(1e-4)
    step = make_train_step(model, opt, AugmentConfig(spatial=True, intensity=True),
                           patch, mixed_precision=True)
    # production wire dtypes (bench.py / train())
    img = jnp.zeros((batch,) + mshape + (1,), jnp.bfloat16)
    lbl = jnp.zeros((batch,) + mshape, jnp.uint8)
    lowered = step.lower(variables["params"], variables.get("batch_stats", {}),
                         opt.init(variables["params"]), img, lbl,
                         jax.random.key(0))
    return lowered.compile().as_text()


def main():
    if sys.argv[1:] and sys.argv[1] != "--step":
        analyze(Path(sys.argv[1]).read_text())
        return
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    text = compile_step(batch, s)
    out = Path(f"/tmp/step_b{batch}_s{s}.hlo")
    out.write_text(text)
    print(f"dumped {out} ({len(text)/1e6:.1f} MB)")
    analyze(text)


if __name__ == "__main__":
    main()
