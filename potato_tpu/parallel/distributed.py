"""Multi-host initialization (the reference has no distributed backend at
all — SURVEY.md §5 'Distributed communication backend': single process,
std::thread + Mutex, src/main.rs:46-103. This module is the jax.distributed
entry path that scales the same ray-parallel render across hosts).

Usage on each host of a pod / multi-process CPU test:

    from potato_tpu.parallel import distributed
    distributed.initialize()          # env-driven (JAX standard vars), or
    distributed.initialize(coordinator="10.0.0.1:9999",
                           num_processes=4, process_id=host_idx)

after which `jax.devices()` spans the pod and the ordinary mesh/shard_map
render path (parallel/mesh.py, parallel/shard.py) runs global collectives
over ICI/DCN with no further changes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[list] = None) -> None:
    """Initialize jax.distributed, preferring explicit args over env vars.

    No-ops when running single-process with no coordinator configured, so
    single-host users never need to call (or avoid) this.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_coordinator() -> bool:
    """True on the host that should write images / logs (host-0 logging)."""
    return jax.process_index() == 0
