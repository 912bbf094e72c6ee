"""Multi-process / multi-host initialization (SURVEY §5.8).

The reference is strictly single-process; the TPU-native scaling story adds
(a) in-process data parallelism over ICI via parallel/sharded.py and (b)
multi-host execution over DCN via jax.distributed. This module is the thin
entry point for (b): call `initialize()` once per process before any jax
computation, then build meshes over `jax.devices()` (which then spans all
hosts' chips) with parallel.sharded.device_mesh.

All cmtci collectives are plain psum/all_gather reductions inside shard_map,
so they ride ICI within a slice and DCN across slices without code changes.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed if running multi-process.

    With no arguments, uses the standard JAX env autodetection
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or the TPU
    pod metadata). Returns True if distributed mode was initialized.
    """
    import jax

    explicit = coordinator_address is not None
    env = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not explicit and not env:
        return False  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> dict:
    """Current process/device topology summary."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
