"""Observability: step metrics logging + device profiling.

The reference has only a tqdm bar + MLflow train_loss logging (SURVEY.md §5.5,
train.py:657). Here: a structured JSONL metrics logger (MLflow-compatible
key/value/step records, greppable and cheap) and jax.profiler trace capture
as a context manager.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics: {"step": i, "time": t, **metrics}."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace (view with TensorBoard / xprof). No-op if dir None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling it/s and data-wait share, like the reference's `td` postfix
    (train.py:567-569, 660-666)."""

    def __init__(self):
        self.t_last = time.time()
        self.data_s = 0.0
        self.step_s = 0.0

    def data_done(self):
        now = time.time()
        self.data_s += now - self.t_last
        self.t_last = now

    def step_done(self):
        now = time.time()
        self.step_s += now - self.t_last
        self.t_last = now

    def report(self) -> Dict[str, float]:
        total = self.data_s + self.step_s
        out = {
            "data_s": round(self.data_s, 3),
            "step_s": round(self.step_s, 3),
            "data_frac": round(self.data_s / total, 3) if total else 0.0,
        }
        self.data_s = self.step_s = 0.0
        return out
