"""Prefetching host data loader (threads; no torch DataLoader).

Replaces the reference's torch DataLoader + DistributedSampler
(trainer.py:119-137).  Decode (PIL/ffmpeg) releases the GIL, so a thread pool
keeps the single jitted train step fed; `prefetch` batches are pipelined
ahead so host decode overlaps device compute (double-buffering happens when
run_training device_puts the next batch while the current step runs).

Multi-host sharding: pass shard_id/num_shards to give each host a disjoint
slice of every epoch (the DistributedSampler role)."""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List

import numpy as np

_END = object()


def device_prefetch(
    items: Iterable,
    put_fn: Callable[[Any], Any],
    depth: int = 2,
) -> Iterator:
    """Double-buffered device_put ring.

    A background thread runs `put_fn` (host prep + jax.device_put) up to
    `depth` items ahead of the consumer; jax dispatch is thread-safe and
    device_put is asynchronous, so host->HBM transfers overlap the step
    currently executing on the device instead of serializing after it
    (ROADMAP r1 #6 / VERDICT r1 #8)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, int(depth)))
    err: List[BaseException] = []
    stop = threading.Event()

    def _put(obj) -> bool:
        # bounded put so an abandoned consumer (early break, step exception)
        # can't leave this thread blocked forever holding `depth` prefetched
        # device batches in HBM
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for it in items:
                if stop.is_set() or not _put(put_fn(it)):
                    return
        except BaseException as e:  # surfaced to the consumer
            err.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # generator close / consumer exception: release the producer and
        # drop queued batches so their device buffers free promptly
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable[[List[Dict[str, Any]]], Dict[str, Any]],
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 2,
        prefetch: int = 2,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, int(num_workers))
        self.prefetch = max(1, int(prefetch))
        self.seed = int(seed)
        self.shard_id = int(shard_id)
        self.num_shards = int(num_shards)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        # contiguous per-host shard of the (shuffled) epoch
        idx = idx[self.shard_id :: self.num_shards]
        if self.drop_last:
            n = (len(idx) // self.batch_size) * self.batch_size
            idx = idx[:n]
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        """One pass over the (sharded) dataset as collated batches."""
        idx = self._epoch_indices(epoch)
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if not batches:
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        break
                    items = list(pool.map(self.dataset.__getitem__, b))
                    out_q.put(self.collate_fn(items))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        """Infinite stream over repeated (re-shuffled) epochs."""
        epoch = 0
        while True:
            yielded = False
            for batch in self.epoch(epoch):
                yielded = True
                yield batch
            if not yielded:
                raise RuntimeError("DataLoader produced an empty epoch")
            epoch += 1
