"""Tracing / profiling hooks.

The reference's observability is a wall-clock print (pymodem.py:136,182-183).
Here: `trace()` wraps a region in a jax.profiler trace (viewable in
TensorBoard / Perfetto), and `timed()` collects named stage wall times that
``report()`` renders.  The CLI enables both with PYMODEM_TPU_PROFILE=<dir>
(stage table always; a profiler trace when the value is a path).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_STAGES: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)
ENABLED = False


def enable(flag: bool = True) -> None:
    global ENABLED
    ENABLED = flag


def reset() -> None:
    """Clear collected stage timings/counts (tests assert on counts)."""
    _STAGES.clear()
    _COUNTS.clear()


def counts() -> dict[str, int]:
    return dict(_COUNTS)


@contextlib.contextmanager
def timed(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STAGES[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace around a region (device + host timelines)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def report() -> str:
    if not _STAGES:
        return ""
    width = max(len(k) for k in _STAGES)
    lines = ["stage timings:"]
    for name, total in sorted(_STAGES.items(), key=lambda kv: -kv[1]):
        lines.append(
            f"  {name:<{width}}  {total:8.3f}s  ({_COUNTS[name]} calls)"
        )
    return "\n".join(lines)
