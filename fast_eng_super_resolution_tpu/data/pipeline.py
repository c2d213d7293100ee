"""Host->device ingestion pipeline: overlap ETL with device compute.

SURVEY §7 P5 / BASELINE config #5: for >1M-node meshes the host-side work
(h5 reads, padding, bucketing) must overlap device steps.  A bounded-queue
prefetcher: worker threads produce padded GraphBatches (host numpy), the
consumer thread calls ``jax.device_put`` one batch ahead of use, so the
accelerator never waits on ETL.  This replaces the reference's synchronous
per-subdomain h5 reads inside the training loop (scheduler_gnn.py:148-151 via
DataLoader over h5-backed Dataset.get, GraphDataset.py:772-797).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

_SENTINEL = object()


def prefetch_to_device(batch_iter: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Yields device-resident batches, keeping ``size`` in flight."""

    q: queue.Queue = queue.Queue(maxsize=size)
    err: list[BaseException] = []
    stop = threading.Event()

    def producer():
        try:
            for batch in batch_iter:
                if sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), batch)
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                # timed put + stop flag: if the consumer abandons the
                # generator, the thread must exit instead of blocking
                # forever on a full queue with device batches pinned
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            # the sentinel MUST reach the consumer (a dropped sentinel
            # deadlocks q.get()); timed puts honor the stop flag when the
            # consumer is gone instead
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
    finally:
        stop.set()
        while not q.empty():  # release pinned device batches
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
    if err:
        raise err[0]


class ThreadedLoader:
    """Parallel host ETL: maps ``load_fn`` over keys with worker threads,
    preserving order, bounded in-flight work."""

    def __init__(self, keys: list, load_fn: Callable, num_workers: int = 4,
                 ahead: int = 8):
        self.keys = keys
        self.load_fn = load_fn
        self.num_workers = num_workers
        self.ahead = ahead

    def __iter__(self):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as pool:
            # deque + popleft: consumed futures (and their loaded results)
            # are dropped, so memory stays bounded by ``ahead`` instead of
            # growing with the dataset
            futures: deque = deque()
            it = iter(self.keys)
            for _ in range(self.ahead):
                k = next(it, _SENTINEL)
                if k is _SENTINEL:
                    break
                futures.append(pool.submit(self.load_fn, k))
            while futures:
                result = futures.popleft().result()
                k = next(it, _SENTINEL)
                if k is not _SENTINEL:
                    futures.append(pool.submit(self.load_fn, k))
                yield result
