"""Numerical sanitizers + preemption hooks (SURVEY.md §5).

On-device data races don't exist under XLA (pure functional programs),
so the 'sanitizer' story here is numerical: detect NaN/Inf in losses,
grads, or params without host syncs in the hot loop, and make training
loops preemption-tolerant (save on SIGTERM — the reference can only
crash-resume from its last periodic save, train_vae.py:72-86).
"""
from __future__ import annotations

import signal
from typing import Any, Iterable

import jax
import jax.numpy as jnp


def finite_flag(tree: Any) -> jnp.ndarray:
    """Scalar bool: True iff every floating leaf is finite. Computed
    on-device; fold it into step metrics and check it at log cadence
    (not every step) to avoid host syncs."""
    leaves = [
        l for l in jax.tree.leaves(tree)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(True)
    flags = [jnp.isfinite(l).all() for l in leaves]
    return jnp.stack(flags).all()


class NonFiniteError(RuntimeError):
    pass


def assert_finite_metrics(metrics: dict, step: int) -> None:
    """Host-side check at log cadence; raises with context on NaN/Inf."""
    for k, v in metrics.items():
        try:
            f = float(v)
        except (TypeError, ValueError):
            continue
        if f != f or f in (float("inf"), float("-inf")):
            raise NonFiniteError(f"non-finite metric {k}={f} at step {step}")


class GracefulShutdown:
    """SIGTERM/SIGINT -> set a flag; training loops check it per step and
    save before exiting (preemption tolerance)."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self.requested = False
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main thread etc.
                pass

    def _handler(self, signum, frame):
        self.requested = True

    def restore(self):
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
