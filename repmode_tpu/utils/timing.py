"""Per-phase wall-clock timing + optional JAX profiler traces.

The reference only logs coarse elapsed times (main.py:122,150,200,233;
time/train, time/val keys at main.py:264,324). This module keeps those keys
and adds first-class jax.profiler integration (SURVEY.md §5.1 rebuild note).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def pop(self, name: str) -> float:
        return self.totals.pop(name, 0.0)

    def as_log_dict(self, prefix: str = "time/") -> Dict[str, float]:
        return {f"{prefix}{k}": v for k, v in self.totals.items()}


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into log_dir (no-op when None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
