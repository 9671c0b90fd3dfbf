"""Lightweight timing/printing helpers (ref: fl/util/profiling.hpp F10).

The reference's ``INIT_PROFILING`` / ``MEASURE("label")`` / ``PV(x)``
wall-clock macros become context managers and helpers that understand JAX
async dispatch (a measurement is meaningless unless the computation is
blocked on). For deep kernel profiling use ``jax.profiler`` traces; these
helpers are the quick printf-style layer the reference used everywhere.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def pv(name, value):
    """Print-value helper (ref: the PV macro)."""
    print(f"{name}: {value}")
    return value


class Stopwatch:
    """INIT_PROFILING/MEASURE analog with device-sync semantics.

    >>> sw = Stopwatch()
    >>> out = step(belief, frame)
    >>> sw.measure("filter step", out)    # blocks on `out`, prints ms
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def measure(self, label: str, block_on=None, reset: bool = True):
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        print(f"{label}: {dt * 1000:.3f} ms")
        if reset:
            self.reset()
        return dt


@contextlib.contextmanager
def measure(label: str, block_on_result: Optional[list] = None):
    """Context-manager timing; append device outputs to block_on_result to
    include their completion in the measurement."""
    t0 = time.perf_counter()
    out: list = block_on_result if block_on_result is not None else []
    yield out
    if out:
        jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter() - t0) * 1000:.3f} ms")
