"""Input pipeline: threaded host-side loading + async device prefetch.

Replaces the reference's ``DataLoader(num_workers=8)`` fork-based workers
(train.py:55-56).  Design per SURVEY.md §5's north-star: the accelerator must
never stall on IO — batches are assembled by a thread pool (PLY reads release
the GIL in NumPy/C++), then pushed to device asynchronously two batches ahead
(double buffering) so ``next(it)`` returns an array already resident in HBM.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import jax
import numpy as np


class BatchLoader:
    """Iterable over (partial, complete) batches of a map-style dataset.

    Epoch shuffling is seeded and reproducible; the final short batch is
    dropped in training (static shapes keep one jit cache entry) and kept in
    eval.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1_000_003 + self._epoch)
            rng.shuffle(order)
        nb = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline batch assembly: submit up to 2 batches ahead
            pending = collections.deque()

            def submit(i):
                idxs = order[i * self.batch_size : (i + 1) * self.batch_size]
                pending.append(pool.map(self.dataset.__getitem__, idxs))

            ahead = 3
            for i in range(min(ahead, nb)):
                submit(i)
            for i in range(nb):
                items = list(pending.popleft())
                if i + ahead < nb:
                    submit(i + ahead)
                partial = np.stack([it[0] for it in items])
                complete = np.stack([it[1] for it in items])
                yield partial, complete


def stage_batch(batch, sharding=None):
    """Stage one host batch onto device(s) under ``sharding``.

    Single-process: a plain (async) ``device_put`` laid out across the mesh.
    Multi-process (``jax.process_count() > 1``): each process holds only its
    local rows of the global batch (the dataset shards by ``process_index``,
    data/shapenet.py), so the global array is assembled with
    ``make_array_from_process_local_data`` — local shards stay put, XLA sees
    one global (global_batch, ...) array sharded over the full mesh.  DCN
    never moves input rows; only gradient all-reduce crosses hosts.
    """
    if sharding is None:
        return jax.tree.map(jax.device_put, batch)
    if jax.process_count() > 1:
        def put_global(x):
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape
            )

        return jax.tree.map(put_global, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Asynchronously stage host batches onto device(s), ``size`` ahead.

    ``jax.device_put`` is async; keeping a small deque of in-flight transfers
    overlaps H2D DMA with the previous step's compute.  With a ``sharding``
    the batch is laid out across the mesh's data axis directly from host
    (globally across processes when under multi-host JAX — see stage_batch).
    """
    q: collections.deque = collections.deque()

    def put(batch):
        return stage_batch(batch, sharding)

    it = iter(iterator)
    try:
        for _ in range(size):
            q.append(put(next(it)))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            q.append(put(next(it)))
        except StopIteration:
            pass
        yield out
