"""Diff the compiled HLO of flax eval vs executor XLA path (m=0)."""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["SEGMANTIC_PACKED_EVAL_MAX"] = "0"

import jax
import jax.numpy as jnp

from segmantic_tpu.infer import executor as ex
from segmantic_tpu.models.unet import UNet


def histo(text: str):
    h = collections.Counter()
    for line in text.splitlines():
        m = re.search(r"= (\S+?)\(", line.strip())
        if not m:
            continue
        op = m.group(1)
        if op.startswith(("convolution", "custom-call", "fusion", "transpose",
                          "copy", "reshape", "dot")):
            shape = line.strip().split(" ")[0]
            h[op.split(".")[0]] += 1
    return h


def conv_lines(text: str):
    out = []
    for line in text.splitlines():
        s = line.strip()
        if re.search(r"= convolution", s) or "custom-call" in s:
            # keep shape + window info, drop names
            s = re.sub(r"%\S+", "", s)
            out.append(s[:180])
    return out


def main():
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

    texts = {}
    for name, fn in (("flax", flax_fwd), ("xla", xla_fwd)):
        c = fn.lower(variables, x).compile()
        texts[name] = c.as_text()
        print(f"== {name} histo:", dict(histo(texts[name])), flush=True)
    for name in ("flax", "xla"):
        print(f"== {name} convolutions ==")
        for s in conv_lines(texts[name]):
            print("  ", s)
    Path("/tmp/flax_hlo.txt").write_text(texts["flax"])
    Path("/tmp/xla_hlo.txt").write_text(texts["xla"])


if __name__ == "__main__":
    main()
