"""Profiling: jax.profiler traces + lightweight stage timers.

The tracing/observability subsystem the reference lacks entirely
(SURVEY.md §5.1 — print statements only). ``trace`` wraps a code region in a
jax.profiler trace viewable in Perfetto/TensorBoard; ``StageTimer`` gives
blocking-accurate wall times for device stages.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region:

        with profiling.trace("/tmp/sfm_trace"):
            engine.run()

    Open the result with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-span inside a trace (shows up in the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Wall-clock stage timing with optional device synchronization."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on: Optional[jax.Array] = None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def summary(self) -> str:
        return ", ".join(f"{k}={v:.3f}s" for k, v in self.times.items())
