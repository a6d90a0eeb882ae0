"""Batched, shuffled, background-prefetching loader feeding the device.

Replaces torch.utils.data.DataLoader (train_vae.py:98) with a minimal
host-side pipeline: index shuffle per epoch, worker-threaded item loads,
one-batch-ahead prefetch, and optional jax.device_put with a
NamedSharding so batches land pre-sharded over the 'data' mesh axis.

Static shapes for jit: the trailing partial batch is dropped by default
(`drop_last=True`); the reference pads nothing and recompiles instead —
under XLA that would be a new compilation per tail size.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        shard_index: "int | None" = None,
        shard_count: "int | None" = None,
        with_labels: bool = False,
        device_cast: bool = False,
    ):
        """batch_size is the GLOBAL batch. On a multi-host job each
        process constructs the loader with the same seed; the per-epoch
        permutation is then identical across hosts, and every host
        loads only its own stripe of each global batch
        (batch_size // shard_count items). shard_index/shard_count
        default to jax.process_index()/process_count(), so single-host
        behavior is unchanged and multi-host sharding needs no flags.

        with_labels=True yields (images, labels int32 [per_host]) pairs
        from the dataset's per-source-dir labels (class conditioning);
        labels ride along unsharded (tiny, placed by jit).

        device_cast=True yields the cache's fp16 batches as-is — half
        the host work and half the H2D transfer; the consumer casts to
        float32 ON DEVICE (exact: the cached values are fp16-quantized
        either way, so fp16 -> fp32 on device is lossless and bit-equal
        to the host cast)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.sharding = sharding
        self.prefetch = prefetch
        if shard_index is None or shard_count is None:
            try:
                import jax

                shard_index = jax.process_index()
                shard_count = jax.process_count()
            except Exception:
                shard_index, shard_count = 0, 1
        assert 0 <= shard_index < shard_count, (shard_index, shard_count)
        assert batch_size % shard_count == 0, (batch_size, shard_count)
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.with_labels = with_labels
        self.device_cast = device_cast

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _make_batch(self, idxs) -> np.ndarray:
        # sequential on purpose: a thread pool measured SLOWER on this
        # one-core host (397 -> 250 imgs/s warm) — the per-item work is
        # a memory-bound fp16 read + cast, not parallelizable IO. The
        # fast path stacks the memory-mapped fp16 cache directly and
        # casts ONCE per batch (411 -> 684 imgs/s warm at b64 256px,
        # benchmarks/loader_bench.py — above the 102 ms b64 train step's
        # ~640 imgs/s demand). device_cast skips the host cast entirely
        # (~3090 imgs/s) and ships half the H2D bytes; the consumer then
        # casts on device.
        load = getattr(self.dataset, "load_raw", None)
        if load is None:  # dataset without a raw fp16 cache
            return np.stack([self.dataset[int(i)] for i in idxs])
        batch = np.stack([load(int(i)) for i in idxs])
        return batch if self.device_cast else batch.astype(np.float32)

    def __iter__(self) -> Iterator:
        idx = self._epoch_indices()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        per_host = self.batch_size // self.shard_count
        lo = self.shard_index * per_host

        def producer():
            for b in range(n_batches):
                if stop.is_set():
                    return
                sl = idx[b * self.batch_size : (b + 1) * self.batch_size]
                # this host's stripe of the global batch (identical idx
                # permutation across hosts via the shared seed)
                sl = sl[lo : lo + per_host]
                batch = self._make_batch(sl)
                if self.sharding is not None:
                    import jax

                    if self.shard_count > 1:
                        # multi-host: each process holds only its stripe;
                        # assemble the global array from per-process local
                        # data (device_put of a per-host-shaped array
                        # against a multi-process sharding is wrong)
                        batch = jax.make_array_from_process_local_data(
                            self.sharding, batch
                        )
                    else:
                        batch = jax.device_put(batch, self.sharding)
                if self.with_labels:
                    labels = np.asarray(
                        [self.dataset.labels[int(i)] for i in sl],
                        dtype=np.int32,
                    )
                    batch = (batch, labels)
                q.put(batch)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
