"""Device mesh + sharding helpers (the framework's scaling axis).

The reference is single-GPU (SURVEY.md §2.8: no DP/TP/PP anywhere). The
TPU-native design scales via batch-dim data parallelism over a
jax.sharding.Mesh: params replicated, batches sharded on axis 0, gradient
all-reduce inserted by the partitioner (psum over ICI). The same helpers
serve the multi-host case — DCN axis first in the mesh shape.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize. On single-host TPU
    slices or CPU this is a no-op. Mesh axes then span all global devices
    (ICI within a slice, DCN across hosts)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(mesh_shape=(), axis_names=("data",)) -> Mesh | None:
    """mesh_shape=() -> None (single device, plain jit)."""
    if not mesh_shape:
        return None
    n = int(np.prod(mesh_shape))
    devs = np.asarray(jax.devices()[:n]).reshape(mesh_shape)
    return Mesh(devs, axis_names[: len(mesh_shape)])


def batch_sharding(mesh: Mesh | None):
    """NamedSharding that splits axis 0 over the 'data' axis."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh | None):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh | None) -> dict:
    """device_put a numpy batch dict: >=2-D arrays sharded on the batch axis,
    1-D shared time axes replicated. Non-array entries are dropped (host-only
    metadata like n_real / notes_text)."""
    out = {}
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            continue
        if mesh is None:
            out[k] = jax.device_put(v)
        elif v.ndim >= 2:
            out[k] = jax.device_put(v, data_sh)
        else:
            out[k] = jax.device_put(v, repl)
    return out
