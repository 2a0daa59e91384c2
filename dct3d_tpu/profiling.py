"""Tracing / profiling / observability.

The reference's only observability is stdout breadcrumbs ("Applying DCT.
This process may take some time..." Encoder.java:58; "Frames processed: %d"
encoder.c:276) and OpenCL events used solely for kernel ordering, never
profiling (encoder.c:227,246; SURVEY.md §5).  Here:

  * StageTimer — lightweight per-stage wall-time/byte counters threaded
    through the streaming drivers (h2d, device wait, d2h, entropy, deflate),
    queryable as a dict and printable as one JSON line;
  * trace() — context manager emitting jax.profiler trace annotations so
    device timelines in TensorBoard/Perfetto show codec stages;
  * profile_to() — whole-program XLA/device trace capture around a block.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict


class StageTimer:
    """Thread-safe accumulator of per-stage seconds / bytes / calls."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.seconds: dict[str, float] = defaultdict(float)
        self.bytes: dict[str, int] = defaultdict(int)
        self.calls: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            with trace(name):
                yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.seconds[name] += dt
                self.bytes[name] += nbytes
                self.calls[name] += 1

    def as_dict(self) -> dict:
        with self._lock:
            return {
                name: {
                    "seconds": round(self.seconds[name], 4),
                    "bytes": self.bytes[name],
                    "calls": self.calls[name],
                    "mb_per_s": round(
                        self.bytes[name] / self.seconds[name] / 1e6, 2
                    ) if self.seconds[name] and self.bytes[name] else None,
                }
                for name in sorted(self.seconds)
            }

    def report(self) -> str:
        return json.dumps(self.as_dict())


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler annotation (no-op cost when no trace is active)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str | None):
    """Capture a device/XLA trace into log_dir (viewable in
    TensorBoard/XProf).  No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
