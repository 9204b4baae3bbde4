"""Training observability: meters, timers, and an optional device profiler.

Parity target: the reference's AverageMeter wall-clock instrumentation
(/root/reference/ssn_train.py:173-174,373-389) plus what it lacks — a hook
into the JAX profiler for real device traces (SURVEY.md §5.1 notes the
reference has no profiler integration).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class AverageMeter:
    """Tracks current value, running sum and average."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __format__(self, spec: str) -> str:
        return f"{self.val:{spec}} ({self.avg:{spec}})"


class MeterBank:
    """Named AverageMeters with one-line formatting."""

    def __init__(self):
        self._meters: Dict[str, AverageMeter] = {}

    def update(self, metrics: Dict[str, float], n: int = 1) -> None:
        for k, v in metrics.items():
            self._meters.setdefault(k, AverageMeter()).update(float(v), n)

    def __getitem__(self, name: str) -> AverageMeter:
        return self._meters.setdefault(name, AverageMeter())

    def line(self, keys=None, fmt: str = ".4f") -> str:
        keys = keys or list(self._meters)
        return " ".join(f"{k} {self._meters[k]:{fmt}}" for k in keys
                        if k in self._meters)


class Timer:
    """Accumulating wall-clock timer usable as a context manager."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.total += time.time() - self._t0
        self.count += 1
        self._t0 = None

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """JAX profiler trace context; no-op when log_dir is falsy.

    View with TensorBoard or xprof. The reference had no equivalent.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
