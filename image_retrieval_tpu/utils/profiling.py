"""Tracing/profiling helpers — the observability layer the reference lacks
(SURVEY §5: only tqdm bars). jax.profiler trace annotations around the
embed/search/analyze stages plus simple throughput counters.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler annotation + wall-clock log."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    logger.debug(f"{name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")


@contextlib.contextmanager
def profile_to(log_dir: Optional[str]):
    """Capture a device trace viewable in TensorBoard/XProf."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Simple items/sec counter for ingest/search loops."""

    def __init__(self, name: str):
        self.name = name
        self.items = 0
        self.t0 = time.perf_counter()

    def add(self, n: int) -> None:
        self.items += n

    @property
    def per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.items / dt if dt > 0 else 0.0

    def log(self) -> None:
        logger.info(f"{self.name}: {self.items} items, {self.per_sec:.1f}/s")


class StageTimes:
    """Per-stage wall-clock accumulator (embed/search/analyze)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> Dict[str, float]:
        return dict(self.times)
