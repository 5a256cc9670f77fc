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
