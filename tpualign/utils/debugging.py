"""Debug-mode numerical and sharding checks.

The reference is single-threaded and has no race/sanitizer tooling
(SURVEY.md §5 — "structurally unnecessary"). The JAX-native equivalents that
DO matter here:

- NaN/Inf detection on embeddings and losses (:func:`check_finite`, and
  :func:`debug_mode` which enables jax_debug_nans globally);
- sharding assertions that catch layout regressions before they become
  silent all-to-alls (:func:`assert_sharded`).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp

from tpualign.utils.logging import get_logger

log = get_logger("debugging")

__all__ = ["check_finite", "debug_mode", "assert_sharded"]


def check_finite(tree, name: str = "tensor") -> None:
    """Host-side finite check over a pytree (use outside jit)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        if not bool(jnp.isfinite(leaf).all()):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


@contextlib.contextmanager
def debug_mode() -> Iterator[None]:
    """Enable jax_debug_nans within a scope (forward passes raise at the
    first NaN-producing op instead of propagating)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_sharded(x, mesh_axis: str, dim: int = 0) -> None:
    """Assert an array is actually sharded over ``mesh_axis`` along ``dim``.

    Catches the classic silent failure where a spec typo replicates a large
    array onto every device.
    """
    sharding = getattr(x, "sharding", None)
    if sharding is None:
        raise AssertionError("array has no sharding")
    spec = getattr(sharding, "spec", None)
    if spec is None:
        raise AssertionError(f"array sharding {sharding} carries no spec")
    entry = spec[dim] if dim < len(spec) else None
    names = entry if isinstance(entry, tuple) else (entry,)
    if mesh_axis not in names:
        raise AssertionError(
            f"expected dim {dim} sharded over {mesh_axis!r}, got spec {spec}"
        )
