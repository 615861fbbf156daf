"""Tracing and throughput observability.

The reference's only observability is tqdm bars and prints (SURVEY.md §5).
Here: ``jax.profiler`` trace annotations around the hot stages (viewable in
TensorBoard/Perfetto when a trace is captured) and a throughput meter for
the headline pairs/sec counter.

On relay-attached TPU setups where ``block_until_ready`` is unreliable,
:func:`device_barrier` synchronizes via a scalar readback (see bench.py
measurement notes).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from tpualign.utils.logging import get_logger

log = get_logger("profiling")

__all__ = ["annotate", "start_trace", "stop_trace", "ThroughputMeter", "device_barrier"]


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named trace span (jax.profiler.TraceAnnotation) + wall-clock debug log."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    log.debug("%s: %.3fs", name, time.perf_counter() - t0)


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)
    log.info("profiler trace started -> %s", log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
    log.info("profiler trace stopped")


def device_barrier(x=None) -> None:
    """Reliable device sync: scalar readback that data-depends on ``x``."""
    if x is None:
        x = jnp.zeros(())
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return
    float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


@dataclass
class ThroughputMeter:
    """Counts items/sec across stages (the pairs/sec/chip headline)."""

    counts: Dict[str, int] = field(default_factory=dict)
    times: Dict[str, float] = field(default_factory=dict)
    _start: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def measure(self, stage: str, items: int) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.counts[stage] = self.counts.get(stage, 0) + items
        self.times[stage] = self.times.get(stage, 0.0) + dt

    def rate(self, stage: str) -> Optional[float]:
        if stage not in self.counts or self.times.get(stage, 0.0) <= 0:
            return None
        return self.counts[stage] / self.times[stage]

    def report(self) -> Dict[str, float]:
        out = {}
        for stage in self.counts:
            r = self.rate(stage)
            if r is not None:
                out[stage] = round(r, 1)
                log.info("%s: %d items in %.2fs (%.1f items/s)",
                         stage, self.counts[stage], self.times[stage], r)
        return out
