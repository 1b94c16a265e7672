"""Cycle-ranked HLO profile of augment_batch alone (batch configurable):
where do the 202 ms at batch 96 go — banded matmuls, transposes, FFTs,
pointwise zoo? Run: python exp/aug_hlo.py [B] [spatial|intensity|full]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from hlo_cycles import analyze  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"

    import jax
    import jax.numpy as jnp

    from segmantic_tpu.train.augment import AugmentConfig, augment_batch

    S, M = 96, 144
    cfg = AugmentConfig(
        spatial=mode in ("spatial", "full"),
        intensity=mode in ("intensity", "full"),
    )
    shape = (B, M, M, M) if cfg.spatial else (B, S, S, S)
    img = jnp.zeros(shape + (1,), jnp.bfloat16)
    lbl = jnp.zeros(shape, jnp.uint8)

    fn = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg, (S,) * 3))
    compiled = fn.lower(img, lbl, jax.random.key(0)).compile()
    text = compiled.as_text()
    out = Path(f"/tmp/aug_b{B}_{mode}.hlo")
    out.write_text(text)
    print(f"dumped {out} ({len(text)/1e6:.1f} MB)")
    analyze(text)


if __name__ == "__main__":
    main()
