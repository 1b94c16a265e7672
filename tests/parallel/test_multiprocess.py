"""Multi-host wiring test: two real processes, one sharded train step.

Exercises ``parallel.mesh.initialize_distributed`` (the jax.distributed
path that is otherwise dead code in single-process CI) with the gloo CPU
collectives backend: 2 processes x 2 local CPU devices form a 4-way data
mesh, each process feeds its local half of the global batch, and both must
compute the same finite loss (the gradient all-reduce crosses processes).
SURVEY.md §5.8; reference has no multi-host path at all
(src/segmantic/seg/monai_unet.py:529-538 is single-host GPU lists).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")

from segmantic_tpu.parallel.mesh import (
    batch_sharding, initialize_distributed, make_mesh, replicate,
)

pid = int(sys.argv[1])
port = sys.argv[2]
initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 4, jax.device_count()
assert jax.process_count() == 2, jax.process_count()

import numpy as np
import jax.numpy as jnp
from segmantic_tpu.models.unet import UNet
from segmantic_tpu.train.augment import AugmentConfig
from segmantic_tpu.train.optim import make_optimizer
from segmantic_tpu.train.trainer import make_train_step

mesh = make_mesh()
model = UNet(spatial_dims=2, in_channels=1, out_channels=2,
             channels=(4, 8), strides=(2,), num_res_units=1)
patch = (8, 8)
variables = model.init(jax.random.key(0),
                       jnp.zeros((1,) + patch + (1,), jnp.float32),
                       training=False)
opt = make_optimizer({"optimizer": "Adam", "lr": 1e-3})
params = replicate(mesh, variables["params"])
batch_stats = replicate(mesh, variables.get("batch_stats", {}))
opt_state = replicate(mesh, opt.init(params))
step = make_train_step(model, opt, AugmentConfig(spatial=False, intensity=False),
                       patch, mixed_precision=False)

# global batch 4, each process owns 2 local rows (deterministic per process)
rng = np.random.default_rng(100 + pid)
local_img = rng.standard_normal((2,) + tuple(p + 4 for p in patch) + (1,)).astype(np.float32)
local_lbl = rng.integers(0, 2, (2,) + tuple(p + 4 for p in patch)).astype(np.int32)

img_sh = batch_sharding(mesh, local_img.ndim)
lbl_sh = batch_sharding(mesh, local_lbl.ndim)
gimg = jax.make_array_from_process_local_data(img_sh, local_img)
glbl = jax.make_array_from_process_local_data(lbl_sh, local_lbl)

params, batch_stats, opt_state, loss = step(
    params, batch_stats, opt_state, gimg, glbl, jax.random.key(1))
print(f"RESULT {pid} {float(loss):.10f}", flush=True)
"""


def test_two_process_sharded_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = "12731"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port, str(REPO)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith(f"RESULT {pid} ")]
        assert line, f"proc {pid} printed no result:\n{out}"
        losses.append(float(line[0].split()[-1]))
    # both processes see the same all-reduced loss, and it is finite
    assert losses[0] == losses[1]
    assert abs(losses[0]) < 1e6
