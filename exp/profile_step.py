"""Device-op time breakdown of the flagship train step via jax.profiler.

Captures an xplane trace of a few steps on the TPU and aggregates XEvent
durations per HLO op category on the device plane.

CAVEAT (shared pool): through the time-shared TPU tunnel the device plane
records ALL tenants' programs — a 79 ms measured step showed 315 ms/step
of attributed ops. Per-op attribution is only trustworthy on dedicated
hardware; on the pool, use interleaved best-of wall timing instead.
Run: python exp/profile_step.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def parse_xplanes(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    planes = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        planes.extend(xs.planes)
    return planes


def device_op_times(planes):
    """op display name -> total self duration (ns) on TPU device planes."""
    out = collections.Counter()
    total = 0
    for plane in planes:
        if "TPU" not in plane.name or "/device:TPU" not in plane.name:
            if not plane.name.startswith("/device:TPU"):
                continue
        ev_names = {m.id: (m.display_name or m.name)
                    for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                pass
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                out[name] += ev.duration_ps // 1000
                total += ev.duration_ps // 1000
    return out, total


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmantic_tpu.models.unet import UNet
    from segmantic_tpu.train.augment import AugmentConfig
    from segmantic_tpu.train.optim import make_optimizer
    from segmantic_tpu.train.trainer import make_train_step

    print("backend:", jax.default_backend(), flush=True)
    B, patch = 8, (96, 96, 96)
    margin = tuple(p + 48 for p in patch)
    model = UNet(spatial_dims=3, in_channels=1, out_channels=8,
                 channels=(16, 32, 64, 128, 256), strides=(2, 2, 2, 2),
                 num_res_units=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1,) + patch + (1,)), training=False)
    opt = make_optimizer({"optimizer": "Adam", "lr": 1e-4})
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt_state = opt.init(params)
    step = make_train_step(model, opt, AugmentConfig(spatial=True, intensity=True),
                           patch, mixed_precision=True)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B,) + margin + (1,)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, 8, (B,) + margin), jnp.int32)
    key = jax.random.key(1)

    params, bstats, opt_state, loss = step(params, bstats, opt_state, img, lbl, key)
    float(loss)

    tdir = tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, img, lbl, sub)
        float(loss)

    planes = parse_xplanes(tdir)
    print("planes:", [p.name for p in planes], flush=True)
    ops, total = device_op_times(planes)
    print(f"total device op time: {total/1e6:.1f} ms over 3 steps", flush=True)
    grouped = collections.Counter()
    for name, ns in ops.items():
        key_ = name.split(".")[0].split("_")[0] if name else "?"
        grouped[key_] += ns
    for name, ns in grouped.most_common(25):
        print(f"{ns/1e6/3:9.3f} ms/step  {name}", flush=True)
    print("---- top single ops ----", flush=True)
    for name, ns in ops.most_common(25):
        print(f"{ns/1e6/3:9.3f} ms/step  {name[:90]}", flush=True)


if __name__ == "__main__":
    main()
