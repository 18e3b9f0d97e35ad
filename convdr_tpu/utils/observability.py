"""Observability: metrics sink, phase timers, optional TPU profiler traces.

The reference's observability is tensorboardX scalars + tqdm + ad-hoc prints
(SURVEY.md §5.1/5.5). Here:

  * :class:`MetricsLogger` -- append-only ``metrics.jsonl`` (one JSON object
    per log step: step, wall time, scalars), trivially greppable/plottable
    and dependency-free;
  * :class:`PhaseTimer`    -- wall-clock per pipeline phase, logged at exit;
  * :func:`profile_trace`  -- context manager around ``jax.profiler`` for
    on-demand TPU traces (SURVEY.md §5.1's upgrade path).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, output_dir: str, filename: str = "metrics.jsonl",
                 prefix: str = ""):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self.prefix = prefix
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {
            "step": int(step),
            "time": round(time.time() - self._t0, 3),
        }
        for k, v in scalars.items():
            key = f"{self.prefix}{k}" if self.prefix else k
            rec[key] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class PhaseTimer:
    """with PhaseTimer("search"): ... -> logs elapsed seconds."""

    def __init__(self, name: str, sink: Optional[MetricsLogger] = None,
                 step: int = 0):
        self.name = name
        self.sink = sink
        self.step = step

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
        logger.info("phase %s: %.4fs", self.name, self.elapsed)
        if self.sink is not None:
            self.sink.log(self.step, {f"{self.name}_seconds": self.elapsed})


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax profiler trace when log_dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
