"""Diff two optimized HLO dumps at the buffer level: top-level (entry /
non-fusion-internal) instructions only — those are what materialize.
Prints each graph's total materialized bytes and the instructions present
in A but not B (by op+shape multiset), sorted by bytes.

Run: python exp/hlo_diff.py /tmp/dice_hlo/dice.hlo /tmp/dice_hlo/sq.hlo
"""

from __future__ import annotations

import re
import sys
from collections import Counter

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
               "u8": 1, "s8": 1, "pred": 1, "u16": 2, "s16": 2, "s64": 8,
               "u64": 8, "f64": 8}


def byte_size(shape: str) -> int:
    total = 0
    for m in re.finditer(r"(\w+)\[([0-9,]*)\]", shape):
        dt, dims = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def top_level_ops(path: str) -> Counter:
    """op-name + shape of every instruction in ENTRY or while-body/cond
    computations (i.e., not inside fused computations)."""
    ops: Counter = Counter()
    in_fused = False
    depth_interesting = False
    for raw in open(path):
        line = raw.rstrip("\n")
        m = re.match(r"(%?[\w.\-]+)\s*(\([^)]*\))?\s*->?.*\{$", line)
        if line.startswith("ENTRY") or (
            re.match(r"%?[\w.\-]+", line) and line.endswith("{")
            and not line.startswith(" ")
        ):
            name = line.split()[0].lstrip("%")
            in_fused = "fused" in name or "computation" in name and "while" not in name
            # treat while bodies/conds and entry as top-level; everything
            # else (fused_*, region_*, reduce computations) as internal
            depth_interesting = (
                line.startswith("ENTRY")
                or name.startswith("while")
                or "body" in name
                or "cond" in name
            )
            continue
        if not depth_interesting:
            continue
        if line.strip() == "}":
            depth_interesting = False
            continue
        lm = re.match(r"\s+(?:ROOT\s+)?%?[\w.\-]+\s*=\s*((?:\([^)]*\)|\S+))\s+([\w\-]+)\(", line)
        if not lm:
            continue
        shape, op = lm.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        ops[(op, shape.split("{")[0])] += 1
    return ops


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = top_level_ops(a_path), top_level_ops(b_path)

    def total(c):
        return sum(byte_size(s) * n for (op, s), n in c.items())

    print(f"A={a_path}: {sum(a.values())} top-level ops, "
          f"{total(a)/1e9:.2f} GB materialized")
    print(f"B={b_path}: {sum(b.values())} top-level ops, "
          f"{total(b)/1e9:.2f} GB materialized")

    diff = a - b
    print(f"\n=== in A beyond B (total {total(diff)/1e9:.2f} GB) ===")
    for (op, shape), n in sorted(diff.items(),
                                 key=lambda kv: -byte_size(kv[0][1]) * kv[1]):
        if byte_size(shape) * n < 20e6:
            continue
        print(f"  {n:3d}x {op:16s} {shape}  ({byte_size(shape)*n/1e6:.0f} MB)")
    diff2 = b - a
    print(f"\n=== in B beyond A (total {total(diff2)/1e9:.2f} GB) ===")
    for (op, shape), n in sorted(diff2.items(),
                                 key=lambda kv: -byte_size(kv[0][1]) * kv[1]):
        if byte_size(shape) * n < 20e6:
            continue
        print(f"  {n:3d}x {op:16s} {shape}  ({byte_size(shape)*n/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
