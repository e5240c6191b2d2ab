"""Device mesh + sharding rules (first-class component, SURVEY.md 2.3/5.8).

The reference's distribution story is implicit DDP-if-launched via HF
Accelerate (`src/train.py:79`) with NCCL underneath and *per-replica* loss
statistics. The TPU-native design is explicit: a `Mesh` over ('data',
'model'), batches sharded along 'data', parameters replicated (or sharded
along 'model' for tensor parallelism), and GSPMD inserting ICI collectives.
Because the train step is one jitted program over sharded arrays, every
cross-replica reduction — gradient psum, metric psum, and the selector's
Gram-matrix statistics — is global-batch exact by construction (stronger
than the reference's DDP semantics, where each replica computes its own
selector statistics).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1, model: int = 1, *, devices=None
) -> Mesh:
    """Mesh over ('data', 'model'); data=-1 consumes remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding along the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays on the mesh, batch-sharded along 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
