"""First-class tracing/profiling: per-stage timing + JAX profiler hooks.

The reference has no tracing (SURVEY.md §5: tqdm bars and wall-time prints
only). Here every pipeline stage can be wrapped in a ``stage_timer`` and a
whole run captured with the XLA profiler for TensorBoard.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class StageTimes:
    """Accumulates wall-time per named stage; dumps JSON."""

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            print(f"[trace] {name}: {dt:.3f}s", flush=True)

    def summary(self) -> dict:
        return {
            name: {"total_s": round(t, 4), "calls": self.counts[name]}
            for name, t in self.times.items()
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


GLOBAL_TIMER = StageTimes()


@contextlib.contextmanager
def xla_profile(logdir: Optional[str] = None):
    """Capture an XLA profiler trace (view with TensorBoard). No-op if the
    profiler is unavailable on this backend."""
    import jax

    logdir = logdir or os.environ.get("MACAQUE_TPU_PROFILE_DIR",
                                      "/tmp/macaque_tpu_profile")
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover
        print(f"[trace] profiler unavailable: {e}")
        started = False
    try:
        yield logdir
    finally:
        if started:
            jax.profiler.stop_trace()
            print(f"[trace] xla trace written to {logdir}")
