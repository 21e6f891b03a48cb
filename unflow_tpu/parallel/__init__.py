"""GSPMD parallelism: mesh construction and sharding helpers.

The reference's only parallelism is single-node multi-GPU in-graph tower
replication with averaged gradients (src/e2eflow/core/train.py, the
``devices`` parameter — SURVEY.md §2.3). The TPU-native equivalent is
declarative: shard the batch axis of every input over a device mesh,
replicate params, and let XLA insert the gradient all-reduce over ICI.
No tower loop, no explicit collectives, no communication backend.

For very large images a second ``spatial`` mesh axis shards W; XLA
inserts halo exchanges for the convolutions automatically. This is the
TPU analog of sequence/context parallelism for this ConvNet domain
(SURVEY.md §2.3) — KITTI/Sintel-size inputs don't need it, but the mesh
plumbing supports it.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_devices: int | None = None, spatial: int = 1, devices=None
) -> Mesh:
    """1D data-parallel mesh, optionally 2D (data, spatial)."""
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    if n % spatial:
        raise ValueError(f"num_devices {n} not divisible by spatial {spatial}")
    dev_array = mesh_utils.create_device_mesh(
        (n // spatial, spatial), devices=devices[:n]
    )
    return Mesh(dev_array, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: int | None = None) -> NamedSharding:
    """Shard dim 0 over 'data' (and optionally W over 'spatial')."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n


from unflow_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    is_lead_process,
    per_process_batch_size,
    process_shard,
    put_global_batch,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_batch_size",
    "init_distributed",
    "is_lead_process",
    "per_process_batch_size",
    "process_shard",
    "put_global_batch",
    "Mesh",
    "NamedSharding",
    "P",
]
