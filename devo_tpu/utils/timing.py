"""Profiling helpers.

Counterpart of the reference's CUDA-event Timer (devo/utils.py:5-28) and the
torch.profiler integration (train.py:143-152): wall-clock section timing
with jax.block_until_ready, named XLA scopes, and a thin wrapper around
jax.profiler for TensorBoard traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax

all_times: Dict[str, List[float]] = defaultdict(list)


class Timer:
    """Section timer; `sync` waits for device completion before stopping."""

    def __init__(self, name: str, enabled: bool = True, sync=None):
        self.name = name
        self.enabled = enabled
        self.sync = sync

    def __enter__(self):
        if self.enabled:
            self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self.sync is not None:
                jax.block_until_ready(self.sync)
            elapsed = (time.perf_counter() - self.start) * 1e3
            all_times[self.name].append(elapsed)
            print(f"{self.name} {elapsed:.3f} ms")


def named_scope(name: str):
    """XLA-visible profiling scope (shows up in jax.profiler traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize() -> Dict[str, float]:
    return {k: sum(v) / max(len(v), 1) for k, v in all_times.items()}


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache across processes.

    Cold CLI runs (the driver's bench, fresh eval trials) otherwise pay the
    full 10-90 s/bucket remote compile every time; with the cache, any
    executable compiled once on this host is deserialized in O(100 ms).
    Safe no-op on jax versions/backends that can't serialize executables.
    """
    import os

    path = path or os.environ.get(
        "DEVO_TPU_CACHE", os.path.expanduser("~/.cache/devo_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
