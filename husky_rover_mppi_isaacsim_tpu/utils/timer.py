"""Nested scoped wall-clock profiler.

Keeps the ergonomics of the reference's ``ScopedTimer``
(src/terrain_management/large_scale_terrain/utils.py:103-158): nestable
context manager with thread-local indentation — reimplemented around
``time.perf_counter`` and optional ``jax.profiler`` trace annotations, with
device-sync-aware timing for jitted callables.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

import jax

_local = threading.local()


class ScopedTimer:
    """``with ScopedTimer("phase", active=True): ...`` — prints nested,
    indented wall-clock timings; also exposes ``.elapsed`` for programmatic
    use."""

    def __init__(self, name: str, active: bool = True, print_fn=print,
                 trace: bool = False):
        self.name = name
        self.active = active
        self.print_fn = print_fn
        self.trace = trace
        self.elapsed = 0.0
        self._trace_ctx = None

    def __enter__(self):
        if not hasattr(_local, "depth"):
            _local.depth = 0
        self._depth = _local.depth
        _local.depth += 1
        if self.trace:
            self._trace_ctx = jax.profiler.TraceAnnotation(self.name)
            self._trace_ctx.__enter__()
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if self._trace_ctx is not None:
            self._trace_ctx.__exit__(*exc)
        _local.depth -= 1
        if self.active:
            indent = "  " * self._depth
            self.print_fn(f"{indent}[{self.name}] {self.elapsed * 1e3:.3f} ms")
        return False


@contextmanager
def block_until_ready(tree):
    """Time a block including device completion of ``tree``'s arrays."""
    yield
    jax.block_until_ready(tree)


def timed(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall-clock of a jitted callable, blocking on the result."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
