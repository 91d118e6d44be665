"""Device mesh and sharding helpers.

The reference's parallelism is one-process-per-GPU via CUDA_VISIBLE_DEVICES
(reference: CLU_training_sweep_example.py:184-197) plus DataLoader workers.
Here a single SPMD program spans the slice: a ``jax.sharding.Mesh`` with a
``data`` axis (batch-sharded over ICI) and an optional ``model`` axis used by
the tensor-parallel scoring path.  Loss/metric reductions become XLA psums
inserted by the partitioner — no NCCL, no process boundaries.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices.

    ``data=-1`` consumes every remaining device.  On a single chip this
    degenerates to a 1x1 mesh so every code path is mesh-driven regardless of
    scale.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch dim sharded over
    ``data``.  Leading dims must be divisible by the data axis size; callers
    pad the final partial batch (srsem.data.loader.pad_batch)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
