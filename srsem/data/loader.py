"""Batching + threaded prefetch loader.

Replaces the reference's ``DataLoader(num_workers=8, pin_memory=True)`` +
zip/stack collate (reference: CLIPLPIPS_REG_training_sweep_example.py:
159-188).  Decode/preprocess runs in a thread pool (PIL releases the GIL
around decode/resize); batches are collated to numpy and double-buffered so
host IO overlaps device compute.  The final partial batch is padded to the
static batch size with a validity mask — jit sees one shape.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np


def collate(samples) -> tuple:
    """zip/stack pair collation: [( (a,b), y ), ...] → ((A, B), Y)."""
    pairs, labels = zip(*samples)
    imgs_a = np.stack([p[0] for p in pairs])
    imgs_b = np.stack([p[1] for p in pairs])
    return (imgs_a, imgs_b), np.stack(labels)


def pad_batch(batch, batch_size: int):
    """Pad a collated batch to ``batch_size`` rows; returns (batch, mask)."""
    (a, b), y = batch
    n = a.shape[0]
    mask = np.zeros((batch_size,), np.float32)
    mask[:n] = 1.0
    if n < batch_size:
        pad = lambda x: np.concatenate(  # noqa: E731
            [x, np.repeat(x[-1:], batch_size - n, axis=0)], axis=0)
        a, b, y = pad(a), pad(b), pad(y)
    return ((a, b), y), mask


def peek_first_batch(loader):
    """First (masked) batch for shape/init probes, WITHOUT consuming a
    :class:`Loader` epoch (see :meth:`Loader.peek_batch`); plain iterables
    (test fixtures yielding lists) fall back to ``next(iter(...))``."""
    if hasattr(loader, "peek_batch"):
        return loader.peek_batch()
    return next(iter(loader))


class Loader:
    """Iterable over padded, masked batches with background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, num_workers: int = 8, prefetch: int = 2,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def peek_batch(self):
        """One collated+padded batch for shape/init probes.

        Unlike ``next(iter(loader))`` this does NOT advance the epoch
        counter: ``__iter__`` seeds each shuffle with ``seed + epoch``, so
        a consuming peek (run_training's init probe) would burn the
        seed+0 ordering and make a cold-start run train epoch 0 on the
        seed+1 shuffle — silently diverging from a warm-start run of the
        identical config."""
        idxs = range(min(self.batch_size, len(self.dataset)))
        samples = [self.dataset[int(i)] for i in idxs]
        return pad_batch(collate(samples), self.batch_size)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        batches = [
            order[i: i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put that notices consumer abandonment (early break
            # from the iterator) instead of blocking forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # A dataset error must reach the CONSUMER: if this thread died
            # without enqueueing a sentinel, the unbounded q.get() below
            # would hang the training run forever instead of raising.
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__, idxs))
                        if not put(pad_batch(collate(samples),
                                             self.batch_size)):
                            return
                put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(e)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
