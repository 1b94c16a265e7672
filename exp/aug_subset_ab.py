"""Interleaved A/B of the spatial-aug gating variants at the bench shape.

bernoulli: the pre-r4 per-sample gating (identity draws still execute the
9-pass chain under vmap). permute: the shipped exact-count subset
(augment.py::_apply_subset_spatial — permute batch, chain the first
round(P[any]*B), crop the rest, unpermute). scatter: a variant that
gathers only the K chain inputs and scatters outputs over the cropped
baseline (less data movement).

RESULT (TPU v5e, b96, r4): bernoulli 147.9 ms, permute 131.0 ms,
scatter 129.0 ms — the subset saves ~17-19 ms of standalone aug (1.13x);
scatter's lighter movement is worth only ~2 ms, so the simpler permute
implementation ships. Run: python exp/aug_subset_ab.py [BATCH]
"""

import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp
from segmantic_tpu.train import augment as A
from segmantic_tpu.train.augment import AugmentConfig, augment_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
S, M = 96, 144
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((B, M, M, M, 1)), jnp.bfloat16)
lbl = jnp.asarray(rng.integers(0, 8, (B, M, M, M)), jnp.uint8)

def subset_scatter(images, labels, key, cfg, out_shape):
    nd = images.ndim - 2
    n_rot = 3 if nd == 3 else 1
    batch = images.shape[0]
    p_any = 1.0 - (1.0 - cfg.rotate_prob) ** n_rot * (1.0 - cfg.zoom_prob)
    count = int(round(p_any * batch))
    crop_i = A._crop_batch(images, out_shape)
    crop_l = A._crop_batch(labels, out_shape)
    if count <= 0:
        return crop_i, crop_l
    k_perm, k_par = jax.random.split(key)
    idx = jax.random.permutation(k_perm, batch)[:count]
    im_s = jnp.take(images, idx, axis=0)
    lb_s = jnp.take(labels, idx, axis=0)
    zoom_min = min(cfg.zoom_range[0], 1.0)
    from segmantic_tpu.ops.shear_resample import rotate_zoom_shear
    def chain(k, im, lb):
        a, z = A._draw_active_spatial_params(k, cfg, nd)
        im = rotate_zoom_shear(im, a, z, order=1, out_shape=out_shape,
                               angle_max=cfg.rotate_range, zoom_min=zoom_min,
                               bf16=cfg.interp_bf16)
        lb = rotate_zoom_shear(lb, a, z, order=0, out_shape=out_shape,
                               angle_max=cfg.rotate_range, zoom_min=zoom_min)
        return im, lb
    ai, al = jax.vmap(chain)(jax.random.split(k_par, count), im_s, lb_s)
    return crop_i.at[idx].set(ai), crop_l.at[idx].set(al)

fns = {}
cfg_on = AugmentConfig(spatial=True, intensity=True, spatial_subset=True)
cfg_off = AugmentConfig(spatial=True, intensity=True, spatial_subset=False)
fns["bernoulli"] = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg_off, (S,)*3))
fns["permute"] = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg_on, (S,)*3))

orig = A._apply_subset_spatial
def patched(i, l, k, cfg, out_shape):
    return subset_scatter(i, l, k, cfg, out_shape)
A._apply_subset_spatial = patched
fns["scatter"] = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg_on, (S,)*3))
o = fns["scatter"](img, lbl, jax.random.key(0)); float(jnp.sum(o[0][:1,:1,:1,:4].astype(jnp.float32)))
A._apply_subset_spatial = orig

for n, f in fns.items():
    o = f(img, lbl, jax.random.key(0)); float(jnp.sum(o[0][:1,:1,:1,:4].astype(jnp.float32)))
best = {n: float("inf") for n in fns}
for _ in range(4):
    for n, f in fns.items():
        k = jax.random.key(1)
        t0 = time.perf_counter()
        for _ in range(8):
            k, sub = jax.random.split(k)
            o = f(img, lbl, sub)
        float(jnp.sum(o[0][:1,:1,:1,:4].astype(jnp.float32)))
        best[n] = min(best[n], (time.perf_counter()-t0)/8)
print(f"B={B}: " + "  ".join(f"{n} {t*1e3:.2f} ms" for n, t in best.items()), flush=True)
