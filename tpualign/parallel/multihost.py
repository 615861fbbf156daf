"""Multi-host (multi-slice) initialization helpers.

Single-host multi-chip needs nothing special — ``jax.devices()`` sees the
whole slice. Across hosts, JAX's distributed runtime must be initialized
before any backend use; this module wraps that plus the DCN-aware mesh
layout: the ``data`` axis is placed across slices (gradient psum tolerates
DCN latency; it happens once per step) while ``model`` stays inside a slice
so tensor-parallel collectives ride ICI (SURVEY.md §2.4; scaling-book
recipe).

No pod hardware exists in this environment — these helpers are exercised by
single-process tests and documented for deployment.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from tpualign.utils.logging import get_logger

log = get_logger("parallel.multihost")

__all__ = ["initialize_distributed", "hybrid_mesh"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env variables
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). Returns True when a
    multi-process runtime was started, False for the single-process case."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed runtime up: process %d/%d, %d global devices",
        process_id, num_processes, jax.device_count(),
    )
    return True


def hybrid_mesh(
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """(data, model) mesh laid out so ``model`` groups stay physically
    adjacent (same host/slice => ICI) and ``data`` spans the rest (DCN-safe).

    Uses jax.devices() ordering, which groups devices by process; taking
    ``model_parallel``-sized contiguous groups keeps TP collectives local.
    """
    devices = np.asarray(jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))
