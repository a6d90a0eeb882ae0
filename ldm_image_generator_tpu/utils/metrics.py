"""Structured per-step metrics: JSONL to stdout + a live progress line.

The reference's only observability is tqdm bar descriptions
(train_vae.py:130, train_ldm.py:88). Here every log step emits one JSON
line (machine-readable) with the scalar metrics plus steps/s and
images/s, and an optional human progress string to stderr.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_every: int = 10, stream=None):
        self.log_every = log_every
        self.stream = stream or sys.stdout
        self._t0 = time.perf_counter()
        self._last_t = self._t0
        self._last_step = 0

    def log(self, step: int, metrics: Dict, batch_size: Optional[int] = None,
            **extra) -> None:
        # elapsed-steps cadence (not step % N): callers may advance step
        # by more than 1 per call (train_ldm --fused-steps)
        if step - self._last_step < self.log_every:
            return
        now = time.perf_counter()
        dt = now - self._last_t
        dsteps = step - self._last_step
        rec = {"step": step, "time": round(now - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = round(float(v), 6)
            except (TypeError, ValueError):
                rec[k] = v
        if dsteps > 0 and dt > 0:
            rec["steps_per_s"] = round(dsteps / dt, 3)
            if batch_size:
                rec["images_per_s"] = round(dsteps * batch_size / dt, 3)
        rec.update(extra)
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()
        self._last_t = now
        self._last_step = step

    def log_now(self, step: int, metrics: Dict, **extra) -> None:
        """Emit one JSONL record unconditionally (e.g. validation results),
        without touching the throughput bookkeeping."""
        rec = {"step": step, "time": round(time.perf_counter() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = round(float(v), 6)
            except (TypeError, ValueError):
                rec[k] = v
        rec.update(extra)
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()
