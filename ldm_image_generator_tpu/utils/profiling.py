"""Profiling / timing harness (SURVEY.md §5 tracing row).

The reference's only timing signal is tqdm (ddpm.py:74). Here:
  * ``fence`` — reliably wait for a computation: on this environment's
    tunneled TPU backend, ``block_until_ready`` can return before the
    device finishes (measured: a 1.1-TFLOP matmul "completing" in 31us),
    so the only trustworthy fence is a device-to-host readback. ``fence``
    pulls one scalar element per output leaf.
  * ``time_fn`` — wall-clock a jitted callable, fenced per iteration.
    Includes the host<->device round-trip (~25ms on the tunnel), so use
    it for end-to-end paths where results reach the host anyway.
  * ``chained_time`` — throughput measurement that amortizes the
    round-trip: runs a shape-preserving step function ``chain_len`` times
    inside ONE jitted lax.scan and fences once.
  * ``trace`` / ``named_scope`` — jax.profiler wrappers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax

named_scope = jax.named_scope


def fence(out):
    """Force completion of every array leaf via a 1-element readback."""
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])
    return out


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            **kwargs) -> Tuple[float, object]:
    """Seconds per call, fenced every iteration (includes host round-trip)."""
    out = None
    for _ in range(warmup):
        out = fence(fn(*args, **kwargs))
    start = time.perf_counter()
    for _ in range(iters):
        out = fence(fn(*args, **kwargs))
    return (time.perf_counter() - start) / iters, out


def chained_time(step_fn: Callable, x0, *consts, chain_len: int = 100,
                 iters: int = 3, warmup: int = 1) -> float:
    """Seconds per step of a shape-preserving step_fn(x, *consts) -> x,
    measured as one jitted scan of chain_len dependent applications
    (device-side sequential chain; a single fence at the end).

    Pass params/large pytrees through *consts — NOT as closures — so jit
    treats them as runtime inputs instead of baking them into the program
    as (potentially GB-sized) constants."""

    @jax.jit
    def chain(x, *consts):
        def body(c, _):
            return step_fn(c, *consts), None

        out, _ = jax.lax.scan(body, x, None, length=chain_len)
        return out

    out = None
    for _ in range(warmup):
        out = fence(chain(x0, *consts))
    start = time.perf_counter()
    for _ in range(iters):
        out = fence(chain(x0, *consts))
    return (time.perf_counter() - start) / (iters * chain_len)


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
