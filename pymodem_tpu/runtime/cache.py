"""Persistent XLA compilation cache.

On this TPU stack, compiling an FFT-convolution program costs tens of
seconds per distinct op instance (remote Mosaic/XLA compile), while running
it costs milliseconds.  The persistent cache amortizes that to one compile
per program shape ever; subsequent CLI/bench invocations start hot.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def _sweep_orphans(path: str) -> None:
    """Drop -atime/-cache files whose pair is missing (LRU-eviction races
    leave these behind and subsequent writes to the same key then fail)."""
    try:
        names = set(os.listdir(path))
    except OSError:
        return
    for name in list(names):
        for suffix, other in (("-atime", "-cache"), ("-cache", "-atime")):
            if name.endswith(suffix):
                stem = name[: -len(suffix)]
                if stem + other not in names:
                    try:
                        os.unlink(os.path.join(path, name))
                    except OSError:
                        pass


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("PYMODEM_TPU_CACHE", None) or _DEFAULT_DIR
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    _sweep_orphans(path)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compilation, even fast ones, and keep large bank programs
    # (the default LRU budget evicts multi-10MB executables).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_compilation_cache_max_size", 20 * 1024**3)
