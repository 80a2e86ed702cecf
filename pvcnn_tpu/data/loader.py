"""Minimal numpy data loader: map-style datasets -> shuffled, fixed-size batches
with background-thread prefetch.

Replaces torch DataLoader (reference train.py:170-176). TPU input pipelines want
fixed shapes and host->device overlap rather than worker processes; a single
prefetch thread suffices because per-item work is light (resampling + augmentation
on a few thousand points).
"""

from __future__ import annotations

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
                 drop_last: bool = False, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[Any]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            yield _collate([self.dataset[int(i)] for i in idx])

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
