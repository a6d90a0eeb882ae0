"""Serving: a dynamic-batching sampler daemon around LDMPipeline.

The reference has no serving story — its sampler is a sequential
batch-1 script (sample_ldm.py:71, SURVEY.md §2#18). On TPU, sampling
throughput is won by batching (bench: b1 ~12 img/s vs b32 ~62 img/s on
one chip), so the serving layer's job is to coalesce concurrent
requests into fixed-size jitted batches:

  * Requests enqueue via submit() (thread-safe) and resolve as futures.
  * A worker thread drains the queue, rounds the group UP to the
    smallest precompiled batch bucket that fits (power-of-two ladder)
    and pads with dummy seeds — e.g. 3 requests run as one batch-4 call
    (the padded slot's compute is the price of zero recompiles); groups
    larger than the top bucket are split. warmup() precompiles the
    ladder. Fixed buckets mean zero recompiles in steady state.
  * max_wait_ms bounds the latency cost of waiting for a fuller batch:
    the worker takes what's there once the oldest request has waited
    long enough.

Run as a JSON/JPEG HTTP daemon via cli/serve.py.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence, Tuple

import jax
import numpy as np


@dataclasses.dataclass
class _Request:
    seed: int
    future: Future
    enqueued_at: float


@dataclasses.dataclass
class ServerStats:
    """Counters mutated from both the submit() callers and the worker
    thread — all writes go through add() under the lock (plain `+=` on
    a shared dataclass is a lost-update race)."""
    requests: int = 0
    batches: int = 0
    images: int = 0
    padded_images: int = 0

    def __post_init__(self):
        self._lock = threading.Lock()

    def add(self, **deltas: int) -> None:
        with self._lock:
            for name, d in deltas.items():
                setattr(self, name, getattr(self, name) + d)

    @property
    def mean_batch(self) -> float:
        return self.images / self.batches if self.batches else 0.0


class SamplerServer:
    """Dynamic-batching front-end over a pipeline's sample().

    pipeline_sample(key, batch) -> uint8 images [batch, H, W, 3]; batch
    must be one of `batch_buckets` (each bucket is one jit
    specialization). Per-request seeds stay independent: the pipeline
    is called with a stacked key per image via fold_in inside the
    wrapper the CLI builds (see cli/serve.py), or any callable with the
    same contract.
    """

    def __init__(
        self,
        pipeline_sample,
        batch_buckets: Sequence[int] = (1, 2, 4, 8),
        max_wait_ms: float = 25.0,
        max_queue: int = 1024,
    ):
        self._sample = pipeline_sample
        self.buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        assert self.buckets and self.buckets[0] >= 1
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[_Request]" = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self.stats = ServerStats()

    # -- lifecycle ---------------------------------------------------------
    def warmup(self) -> None:
        """Precompile every batch bucket (first calls are slow on TPU)."""
        for b in self.buckets:
            keys = jax.numpy.stack(
                [jax.random.PRNGKey(i) for i in range(b)]
            )
            np.asarray(self._sample(keys, b))

    def start(self) -> "SamplerServer":
        assert self._worker is None, "already started"
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=30)
            self._worker = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- client API ---------------------------------------------------------
    def submit(self, seed: int) -> Future:
        """Enqueue one image request; resolves to uint8 [H, W, 3]."""
        fut: Future = Future()
        self._q.put(_Request(int(seed), fut, time.monotonic()))
        self.stats.add(requests=1)
        return fut

    def sample_sync(self, seed: int, timeout: Optional[float] = None):
        return self.submit(seed).result(timeout=timeout)

    # -- worker --------------------------------------------------------------
    def _take_group(self) -> Tuple[_Request, ...]:
        """Block for the first request, then gather more until the
        largest bucket is filled or the oldest request times out."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return ()
        group = [first]
        deadline = first.enqueued_at + self.max_wait
        while len(group) < self.buckets[-1]:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                group.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return tuple(group)

    def _bucket_for(self, n: int) -> int:
        """Smallest bucket >= n, else the largest bucket."""
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _run(self) -> None:
        pending: list = []
        while not self._stop.is_set() or pending or not self._q.empty():
            if not pending:
                pending = list(self._take_group())
                if not pending:
                    if self._stop.is_set():
                        break
                    continue
            bucket = self._bucket_for(len(pending))
            group, pending = pending[:bucket], pending[bucket:]
            pad = bucket - len(group)
            seeds = [r.seed for r in group] + [0] * pad
            try:
                keys = jax.numpy.stack(
                    [jax.random.PRNGKey(s) for s in seeds]
                )
                imgs = np.asarray(self._sample(keys, bucket))
                self.stats.add(batches=1, images=len(group),
                               padded_images=pad)
                for r, img in zip(group, imgs):
                    r.future.set_result(img)
            except Exception as e:  # pragma: no cover - propagate to callers
                for r in group:
                    r.future.set_exception(e)
