"""Multi-host (pod-scale) runtime: process init + per-host batch feeding.

The reference never scales past one machine (SURVEY.md §2.3 — TF1
in-graph towers). The TPU-native story for multi-host slices/pods is:

- every host runs the SAME program (single-controller-per-process JAX);
- ``jax.distributed.initialize`` wires the coordination service so
  ``jax.devices()`` becomes the GLOBAL device list (ICI within a slice,
  DCN across slices);
- the mesh is built over global devices (``create_mesh`` already does);
- each host feeds only the batch rows its local devices own —
  ``jax.make_array_from_process_local_data`` assembles the logical
  global array without any host gathering the full batch;
- the jitted train step is unchanged: GSPMD sees one global program.

Single-process behavior is identical to the plain path, so everything
here is exercised by the regular test suite; a 2-process CPU
integration test (tests/test_distributed.py, slow) runs the real
coordination-service path.
"""

from __future__ import annotations

import os
from typing import Any

import jax

from jax.sharding import NamedSharding


_COORDINATOR_ENV = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")


def _pod_detected() -> bool:
    """True on a multi-host Cloud TPU slice (before backend init).

    Standard TPU-VM tooling exports NO coordinator address — the
    multi-host marker is the TPU runtime's worker-hostnames list (>1
    entry). ``UNFLOW_DISTRIBUTED=1`` forces initialization for
    environments with other launchers.
    """
    if os.environ.get("UNFLOW_DISTRIBUTED") == "1":
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-process JAX when configured; no-op otherwise.

    Explicit arguments always initialize. With no arguments, initializes
    when a coordinator address is present in the environment
    (``COORDINATOR_ADDRESS`` / ``JAX_COORDINATOR_ADDRESS``), when the
    TPU runtime reports a multi-host slice (``TPU_WORKER_HOSTNAMES``
    with >1 entry — standard TPU-VM tooling sets no coordinator var),
    or when forced with ``UNFLOW_DISTRIBUTED=1`` —
    ``jax.distributed.initialize()`` then auto-detects the process
    topology from the TPU metadata. Idempotent: returns True if the
    distributed client is (now) initialized.
    """
    if jax.distributed.is_initialized():
        return True
    explicit = coordinator_address is not None or process_id is not None
    if (
        not explicit
        and not any(os.environ.get(k) for k in _COORDINATOR_ENV)
        and not _pod_detected()
    ):
        return False
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def is_lead_process() -> bool:
    """True on the process that should own filesystem side effects
    (metrics, summaries, checkpoints on a shared filesystem)."""
    return jax.process_index() == 0


def process_shard() -> tuple[int, int]:
    """(process_index, process_count) — the Loader's ``shard`` argument."""
    return jax.process_index(), jax.process_count()


def per_process_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    return global_batch // n


def put_global_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Device-put one host's LOCAL batch slice as the global sharded batch.

    Single-process: a plain sharded device_put. Multi-process: each host
    passes its ``global_batch / process_count`` rows and JAX assembles
    the logical global array across hosts (no cross-host data movement —
    the rows land on the local devices the sharding assigns them to).
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


__all__ = [
    "init_distributed",
    "is_lead_process",
    "process_shard",
    "per_process_batch_size",
    "put_global_batch",
]
