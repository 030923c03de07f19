"""Multi-host launch path: `jax.distributed` initialisation + global mesh.

The reference is single-process/single-GPU; multi-host scaling is a new
capability of this framework (BASELINE.md target: >=0.7 scaling efficiency
at 2 hosts). One process per host; every process calls `init_distributed`
before first device use, then builds the SAME global mesh over
`jax.devices()` (which, after initialisation, enumerates the devices of ALL
hosts). The sharded-map programs (parallel/sharded_map.py) are pure SPMD
(`shard_map` over the `map` axis) and run unchanged on a multi-host mesh —
collectives (`pmin`, `psum`) ride ICI within a host and DCN across hosts.

Launch on each host (or under SLURM, where the env is auto-detected):

    python scripts/bench_scaling.py \
        --coordinator=<host0>:8476 --num-processes=2 --process-id=<i>
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialise the multi-process JAX runtime; returns this process's id.

    Single-process (all args None, no env) is a no-op returning 0, so every
    entry point can call this unconditionally. Arguments fall back to the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID), and `jax.distributed.initialize` itself auto-detects
    SLURM / Open MPI environments."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return 0  # single-process mode
    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_index()


def shutdown_distributed() -> None:
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def global_map_mesh():
    """1-D `map`-axis mesh over ALL devices of ALL processes.

    Call after `init_distributed`. Every process must build the identical
    mesh (jax.devices() is globally consistent)."""
    from .mesh import make_map_mesh
    return make_map_mesh(devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
