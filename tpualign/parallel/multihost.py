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

__all__ = ["initialize_distributed", "hybrid_mesh", "hybrid_device_order"]


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


def hybrid_device_order(
    slice_ids: Sequence[int], model_parallel: int
) -> np.ndarray:
    """(data, model) index grid over devices with the given slice ids.

    The invariant that makes the layout DCN-safe: every ``model`` row is
    ``model_parallel`` devices from ONE slice (TP activation collectives
    ride ICI, never DCN); the ``data`` axis is slice-major, so the only
    collective that crosses DCN is the once-per-step gradient psum —
    exactly the axis that tolerates DCN latency (scaling-book recipe).

    Pure function of the slice assignment so the layout rule is testable
    without pod hardware. Raises when any slice's device count is not
    divisible by ``model_parallel``.
    """
    ids = np.asarray(slice_ids)
    n = len(ids)
    if n % model_parallel:
        raise ValueError(
            f"{n} devices not divisible by model={model_parallel}"
        )
    order = []
    for s in sorted(set(int(i) for i in ids)):
        members = np.flatnonzero(ids == s)
        if len(members) % model_parallel:
            raise ValueError(
                f"slice {s} has {len(members)} devices, not divisible by "
                f"model={model_parallel} — a TP group would straddle DCN"
            )
        order.append(members.reshape(-1, model_parallel))
    return np.concatenate(order, axis=0)


def hybrid_mesh(
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """(data, model) mesh laid out so ``model`` groups stay physically
    adjacent (same slice => ICI) and ``data`` spans slices (DCN-safe).

    Multi-slice aware: devices are grouped by their ``slice_index`` (0 when
    absent, e.g. CPU or single-slice), and :func:`hybrid_device_order`
    guarantees no TP group crosses a slice boundary. On a single slice this
    reduces to contiguous ``model_parallel`` groups in jax.devices() order
    (which groups devices by process, keeping TP intra-host where possible).
    """
    devices = np.asarray(jax.devices())
    ids = [getattr(d, "slice_index", 0) or 0 for d in devices]
    grid = devices[hybrid_device_order(ids, model_parallel)]
    return Mesh(grid, axis_names=tuple(axis_names))
