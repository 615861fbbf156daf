"""Device mesh construction.

Axes: ``data`` (batch/corpus sharding; collectives ride ICI) and ``model``
(tensor parallelism for the large towers). Single-chip runs use a (1, 1)
mesh so every code path is mesh-shaped regardless of scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from tpualign.config import MeshConfig

__all__ = ["create_mesh", "default_mesh"]


def create_mesh(
    data: int,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh from the given or all available devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(
            f"mesh {data}x{model} needs {need} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(grid, axis_names=tuple(axis_names))


def default_mesh(config: Optional[MeshConfig] = None) -> Mesh:
    """Mesh from config; with no config, all devices go on the data axis."""
    if config is not None and (config.data * config.model) > 1:
        return create_mesh(config.data, config.model)
    n = len(jax.devices())
    if config is not None and config.num_devices == 1:
        return create_mesh(1, 1)
    return create_mesh(n, 1)
