"""Observability — reference tb_logger + per-iter timing (SURVEY.md §5).

The reference logged scalars to TensorBoard (rank 0) and wall-clock per
iteration in the train log line. Here:

  * MetricsWriter: TensorBoard events via torch.utils.tensorboard when
    available (torch-cpu is in the image), ALWAYS mirrored to a
    metrics.jsonl (machine-readable, no TB needed to consume).
  * StepTimer: wall-clock + EMA step time and throughput.
  * profile_trace: context manager around jax.profiler.trace — captures a
    device trace viewable in TensorBoard/Perfetto (the reference had no
    profiler integration at all; SURVEY.md §5 says add one).
"""

from __future__ import annotations

import contextlib
import json
import os
import os.path as osp
import time
from typing import Dict, Optional

__all__ = ["MetricsWriter", "StepTimer", "profile_trace"]


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(osp.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "ts": time.time(), **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """EMA step-time/throughput meter (items = frames or samples)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def tick(self) -> None:
        self._t0 = time.perf_counter()

    def tock(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def throughput(self, items: int) -> float:
        return items / self.avg if self.avg else 0.0


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler device trace around a code block (TB 'profile' tab)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
