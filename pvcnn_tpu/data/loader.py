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
import multiprocessing as mp
import os as _os
import queue
import threading
from typing import Any, Iterator

import numpy as np

__all__ = ["DataLoader", "data_parallel_args"]


def data_parallel_args(global_batch_size: int, split: str,
                       process_count: int | None = None) -> dict:
    """DataLoader kwargs for a split under multi-host data parallelism.

    Train split: each process loads a DISJOINT rank-strided shard
    (shard_by_process) at the LOCAL batch size global/world, so the global
    batch assembled by parallel/mesh.shard_batch (which uses
    jax.make_array_from_process_local_data on multi-host) is an unbiased
    shuffle of the dataset and every host runs the same step count. Eval
    splits: every host loads the FULL set at the global batch size —
    duplicate work, but every host computes identical meters with no
    cross-host reduction (the reference is single-host; eval is a tiny
    fraction of epoch time, docs/PERFORMANCE.md). Single-process: a no-op
    passthrough.
    """
    if process_count is None:
        import jax

        process_count = jax.process_count()
    if process_count <= 1 or split != "train":
        return {"batch_size": int(global_batch_size),
                "shard_by_process": False}
    assert global_batch_size % process_count == 0, (
        f"global batch {global_batch_size} must divide evenly over "
        f"{process_count} processes")
    return {"batch_size": int(global_batch_size) // process_count,
            "shard_by_process": True}


def _proc_worker(dataset, task_q, out_q):
    """Worker-process loop: build whole batches. Each task seeds numpy's
    global RNG from (loader seed, epoch, batch index), so augmentation draws
    are DETERMINISTIC and independent of worker count / scheduling — unlike
    the thread pool, whose draws interleave on the shared global state.
    Workers are PERSISTENT across epochs (torch persistent_workers=True):
    the dataset's in-memory cache survives, so after the first epoch a
    parse-heavy dataset (ShapeNet .txt) serves resample-only work."""
    while True:
        task = task_q.get()
        if task is None:
            return
        epoch, j, idx, seed = task
        try:
            np.random.seed(seed)
            out_q.put((epoch, j,
                       _collate([dataset[int(i)] for i in idx]), None))
        except BaseException as e:  # pragma: no cover - error path
            try:
                out_q.put((epoch, j, None, e))
            except Exception:
                out_q.put((epoch, j, None, RuntimeError(repr(e))))


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
                 num_workers: int = 0, workers_mode: str = "thread",
                 shard_by_process: bool = False,
                 process_index: int | None = None,
                 process_count: int | None = None):
        # workers_mode: "thread" parallelizes GIL-releasing item work (h5py
        # reads — right for S3DIS); "process" forks worker processes per
        # epoch (torch DataLoader's model, reference train.py:174
        # num_workers=16) for GIL-bound numpy item work (ShapeNet's
        # resample+jitter+one-hot — measured ~36 ms/batch serial, which
        # cannot feed a ~32 ms train step; threads make it WORSE).
        assert workers_mode in ("thread", "process"), workers_mode
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        # clamp to the host's cores: on a 1-core host any pool only adds
        # overhead (measured: thread/process pools REGRESS loader rate there);
        # reference hosts run 16 workers on many-core machines.
        # PVCNN_TPU_LOADER_FORCE_WORKERS=1 skips the clamp (tests exercise
        # the pool paths on 1-core CI).
        from pvcnn_tpu.utils import knobs as _knobs

        if _knobs.get("PVCNN_TPU_LOADER_FORCE_WORKERS"):
            self.num_workers = int(num_workers)
        else:
            cores = _os.cpu_count() or 1
            self.num_workers = (0 if cores <= 1
                                else min(int(num_workers), cores))
        self.workers_mode = workers_mode
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
            # a missing process_count would silently shard as (rank, 1):
            # order[rank::1] DROPS the first `rank` samples instead of
            # sharding — make the misuse loud instead
            assert self._process_count is not None, (
                "DataLoader(process_index=...) requires process_count")
            rank, world = int(self._process_index), int(self._process_count)
            assert 0 <= rank < world, (rank, world)
            return rank, world
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
        if self.num_workers > 0 and self.workers_mode == "process":
            yield from self._batches_processes(order, stop)
            return
        if self.num_workers > 0:
            yield from self._batches_pooled(order, stop)
            return
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            yield _collate([self.dataset[int(i)] for i in idx])

    def _ensure_pool(self):
        if getattr(self, "_pool", None) is not None:
            return self._pool
        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        out_q = ctx.Queue()
        procs = [ctx.Process(target=_proc_worker,
                             args=(self.dataset, task_q, out_q), daemon=True)
                 for _ in range(self.num_workers)]
        for p in procs:
            p.start()
        self._pool = (task_q, out_q, procs)
        return self._pool

    def close(self):
        """Shut the persistent worker-process pool down (daemon workers die
        with the parent anyway; call this to release them early)."""
        pool = getattr(self, "_pool", None)
        if pool is None:
            return
        task_q, _, procs = pool
        self._pool = None
        for _ in procs:
            task_q.put(None)
        for p in procs:
            p.join(timeout=5)
            if p.is_alive():  # wedged worker: don't hang shutdown
                p.terminate()

    def __del__(self):  # pragma: no cover - interpreter-shutdown ordering
        try:
            self.close()
        except Exception:
            pass

    def _batches_processes(self, order, stop) -> Iterator[Any]:
        """PERSISTENT worker-process pool (forked once, reused every epoch —
        dataset caches in the workers survive, unlike torch's default
        fork-per-epoch; memory cost is up to one dataset cache per worker).
        Batch-level tasks, deterministic order via a reorder buffer,
        deterministic augmentation via per-batch RNG seeding. Results are
        tagged with the epoch so an abandoned epoch's stragglers are dropped,
        not misdelivered."""
        starts = list(range(0, stop, self.batch_size))
        if not starts:
            return
        task_q, out_q, procs = self._ensure_pool()
        depth = min(self.num_workers + max(self.prefetch, 1), len(starts))
        epoch = self._epoch

        def submit(j):
            idx = [int(i) for i in order[starts[j]:starts[j]
                                         + self.batch_size]]
            seed = (self.seed * 1000003 + epoch * 9176 + j) % (2 ** 32)
            task_q.put((epoch, j, idx, seed))

        for j in range(depth):
            submit(j)
        ahead = depth
        held: dict = {}
        for want in range(len(starts)):
            while want not in held:
                try:
                    ep, j, batch, err = out_q.get(timeout=30)
                except queue.Empty:
                    # a worker that died without posting (OOM kill, native
                    # segfault) would otherwise hang this get() forever —
                    # torch DataLoader detects dead workers; so do we
                    dead = [p.pid for p in procs if not p.is_alive()]
                    if dead:
                        self.close()
                        raise RuntimeError(
                            f"DataLoader worker process(es) {dead} died "
                            "unexpectedly (killed / crashed?)")
                    continue
                if ep != epoch:
                    continue            # straggler from an abandoned epoch
                if err is not None:
                    raise err
                held[j] = batch
                if ahead < len(starts):
                    submit(ahead)
                    ahead += 1
            yield held.pop(want)

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
