"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference;
first-class here).

* ``StageTimer`` — lightweight per-stage wall-clock accounting for the
  serving pipeline (decode / detect / forward), with rolling means;
* ``trace`` — context manager around ``jax.profiler`` writing TensorBoard-
  compatible traces (set ``DFDT_PROFILE_DIR`` or pass a path);
* ``annotate`` — named trace region (shows up on the TPU timeline).
"""

from __future__ import annotations

import collections
import contextlib
import os
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    def __init__(self, window: int = 100):
        self._samples: Dict[str, collections.deque] = {}
        self.window = window

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dq = self._samples.setdefault(
                name, collections.deque(maxlen=self.window))
            dq.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, dq in self._samples.items():
            if not dq:
                continue
            vals = sorted(dq)
            out[name] = {
                "mean_ms": sum(vals) / len(vals) * 1e3,
                "p50_ms": vals[len(vals) // 2] * 1e3,
                "max_ms": vals[-1] * 1e3,
                "count": len(vals),
            }
        return out

    def report(self) -> str:
        return " | ".join(
            f"{name}: {s['mean_ms']:.1f}ms (p50 {s['p50_ms']:.1f}, "
            f"max {s['max_ms']:.1f}, n={s['count']})"
            for name, s in self.summary().items())


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """``with trace('/tmp/tb'):`` → TensorBoard trace of everything inside."""
    import jax

    log_dir = log_dir or os.environ.get("DFDT_PROFILE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region on the device timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
