"""Profiling / tracing hooks — first-class observability.

The reference has no tracing at all (progress is print/tqdm —
SURVEY.md section 5).  Here: jax.profiler trace capture around any code
block, a lightweight step timer with throughput accounting, and device
memory stats.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing + items/sec, with warmup exclusion.

    Usage:
        timer = StepTimer(warmup=3)
        for batch in data:
            with timer.step(items=batch_size):
                state, loss = train_step(...)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self.items: List[int] = []

    @contextlib.contextmanager
    def step(self, items: int = 1):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        self.items.append(items)

    def summary(self) -> Dict[str, float]:
        times = self.times[self.warmup:]
        items = self.items[self.warmup:]
        if not times:
            return {"steps": 0}
        total = sum(times)
        return {
            "steps": len(times),
            "mean_step_s": total / len(times),
            "p50_step_s": sorted(times)[len(times) // 2],
            "items_per_sec": sum(items) / total,
        }


def device_memory_stats() -> Optional[Dict]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


class MetricsLogger:
    """Append-only JSONL metrics log (upgrade over the reference's stdout
    prints; no TensorBoard/W&B dependency)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
