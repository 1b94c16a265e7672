"""Device mesh + sharding utilities: the distributed backbone.

The TPU-native replacement for the reference's Lightning multi-GPU device
list (reference: src/segmantic/seg/monai_unet.py:529-538, the only
parallelism it has): a named ``jax.sharding.Mesh`` with a ``data`` axis for
batch parallelism (a ``model`` axis is reserved for tensor parallelism of
very wide decoders). Gradients all-reduce over ICI automatically — the
train step is jit-compiled with sharded batch inputs and replicated params,
and XLA inserts the psum. Multi-host (DCN) wiring goes through
``jax.distributed.initialize``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (no-op in single-process runs).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are not given; silently skips if neither is configured.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default: all devices on the data axis (pure batch parallelism). The
    data axis should map to ICI-adjacent devices — jax.devices() order does
    this on TPU slices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree onto every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_params(mesh: Mesh, params: Any, min_features: int = 64) -> Any:
    """Tensor-parallel parameter placement over the mesh's 'model' axis.

    Conv/dense kernels whose OUTPUT-feature axis (last dim) is wide enough
    and divisible by the model-axis size are sharded over 'model'; matching
    1-D vectors (bias, norm scale/shift, batch stats) shard likewise;
    everything else replicates. With a model axis of 1 this degrades to
    plain replication. XLA inserts the all-gathers/reduce-scatters implied
    by mixing sharded weights with batch-sharded activations — the
    Megatron-style recipe without manual collectives (SURVEY.md §2.9;
    the reference's only parallelism is a Lightning GPU list,
    src/segmantic/seg/monai_unet.py:529-538).
    """
    n_model = mesh.shape["model"]

    def placement(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if (
            n_model > 1
            and x.ndim >= 1
            and x.shape[-1] >= min_features
            and x.shape[-1] % n_model == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, placement(x)), params
    )


def zero_placement(mesh: Mesh, x: Any) -> NamedSharding:
    """ZeRO-1 placement for one optimizer-state (or gradient) leaf.

    Shards the leaf's largest 'data'-divisible axis over the mesh's ``data``
    axis; scalars and indivisible leaves replicate. Shape-only decision, so
    it works on traced values inside jit as well as on concrete arrays.
    """
    n_data = int(mesh.shape["data"])
    ndim = getattr(x, "ndim", 0)
    if n_data > 1 and ndim >= 1:
        shape = x.shape
        divisible = [
            i for i in range(ndim) if shape[i] >= n_data and shape[i] % n_data == 0
        ]
        if divisible:
            axis = max(divisible, key=lambda i: shape[i])
            spec = [None] * ndim
            spec[axis] = "data"
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_opt_state(mesh: Mesh, opt_state: Any) -> Any:
    """ZeRO-1: partition optimizer state (Adam moments, etc.) over 'data'.

    Each device holds 1/N of every shardable moment tensor instead of a
    full replica — optimizer memory scales down with the data-parallel
    size. The train step keeps gradients in the same layout through the
    update (reduce-scatter + sharded update + param all-gather; XLA derives
    the collectives from the sharding constraints). The reference has no
    distributed optimizer at all (its only parallelism is a Lightning GPU
    list, reference: src/segmantic/seg/monai_unet.py:529-538).
    """
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, zero_placement(mesh, x)), opt_state
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded over
    'data' (per-host loaders feed their local shard; replaces DDP samplers)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def put_batch(mesh: Mesh, x: Any) -> Any:
    """Shard the leading axis over 'data' when divisible; replicate otherwise
    (tiny debug batches still run, production batches shard).

    Multi-host: each process passes its LOCAL batch rows and the result is
    the global array (global batch = local batch x process count), i.e. the
    per-host loading that replaces DDP samplers (SURVEY.md §5.8).
    """
    n_data = mesh.shape["data"]
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, x.ndim), np.asarray(x)
        )
    if x.shape[0] % n_data == 0:
        return jax.device_put(x, batch_sharding(mesh, x.ndim))
    return jax.device_put(x, NamedSharding(mesh, P()))
