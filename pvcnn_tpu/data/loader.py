"""Minimal numpy data loader: map-style datasets -> shuffled, fixed-size batches
with background prefetch and a parallel item-fetch pool.

Replaces torch DataLoader (reference train.py:170-176, configs/__init__.py:8
`num_workers=16`). TPU input pipelines want fixed shapes and host->device
overlap rather than worker processes; item fetch runs on a thread pool
(h5py reads and large numpy copies release the GIL) and a background thread
assembles + prefetches whole batches, so the accelerator never waits on the
host as long as batch assembly keeps up with the step time (measured in
tools/bench_input.py; see docs/PERFORMANCE.md "Input pipeline").

Multi-host: `shard_by_process=True` gives each JAX process a disjoint,
deterministic slice of every epoch's sample order (torch
DistributedSampler's role) — processes see `len(dataset)//num_processes`
samples each, same shuffle seed, rank-strided, so the global batch across
hosts is an unbiased shuffle of the dataset.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Any, Iterator

import numpy as np

__all__ = ["DataLoader"]


def _collate(items):
    """Stack a list of samples; supports (inputs, targets) tuples of arrays/dicts."""
    first = items[0]
    if isinstance(first, dict):
        return {k: _collate([it[k] for it in items]) for k in first}
    if isinstance(first, tuple):
        return tuple(_collate([it[i] for it in items]) for i in range(len(first)))
    return np.stack([np.asarray(it) for it in items])


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, prefetch: int = 2,
                 num_workers: int = 0, shard_by_process: bool = False,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = int(num_workers)
        self.shard_by_process = shard_by_process
        # explicit overrides keep multi-host sharding testable without
        # spawning real processes (and callers on CPU meshes deterministic)
        self._process_index = process_index
        self._process_count = process_count
        self._epoch = 0

    # -- multi-host sharding ------------------------------------------------
    def _shard(self):
        """-> (rank, world) for this epoch's order slice."""
        if not self.shard_by_process:
            return 0, 1
        if self._process_index is not None:
            return int(self._process_index), int(self._process_count or 1)
        import jax

        return jax.process_index(), jax.process_count()

    def _num_samples(self) -> int:
        rank, world = self._shard()
        n = len(self.dataset)
        if world > 1:
            # equal per-process counts keep every host's step count identical
            # (a straggler host would deadlock collectives)
            n = n // world
        return n

    def __len__(self) -> int:
        n = self._num_samples()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        rank, world = self._shard()
        if world > 1:
            order = order[rank::world][: n // world]
        return order

    def _batches(self) -> Iterator[Any]:
        order = self._order()
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        if self.num_workers > 0:
            yield from self._batches_pooled(order, stop)
            return
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            yield _collate([self.dataset[int(i)] for i in idx])

    def _batches_pooled(self, order, stop) -> Iterator[Any]:
        """Fetch items on a thread pool, keeping batch order deterministic.

        Items of the next few batches are in flight while the current batch
        collates; results are identical to the serial path because each item
        future is awaited in order. Dataset __getitem__ must be thread-safe
        (ours are: h5py handles are opened per-file once, reads are GIL-free;
        np.random draws use the global state, so per-item jitter differs from
        the serial path only in RNG interleaving — same distribution).
        """
        depth = max(self.prefetch, 1) + 1
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: queue.Queue = queue.Queue()
            starts = list(range(0, stop, self.batch_size))

            def submit(start):
                idx = order[start:start + self.batch_size]
                pending.put([pool.submit(self.dataset.__getitem__, int(i))
                             for i in idx])

            ahead = min(depth, len(starts))
            for s in starts[:ahead]:
                submit(s)
            for j in range(len(starts)):
                futs = pending.get()
                if ahead < len(starts):
                    submit(starts[ahead])
                    ahead += 1
                yield _collate([f.result() for f in futs])

    def __iter__(self):
        self._epoch += 1
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surface loader errors in the main thread
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is sentinel:
                break
            yield b
        t.join()
        if err:
            raise err[0]
