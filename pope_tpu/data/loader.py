"""Host->device input pipeline.

Reference behavior: pose/pose_utils.py:99-155 `data_prefetcher` — overlaps
host loading with device compute using a side CUDA stream. TPU-native: a
thread pool decodes/loads batches ahead while `jax.device_put` transfers are
issued early so the next batch is already on-device (or in flight) when the
step function needs it; transfers are async in jax so one batch of lookahead
gives full overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


class ThreadedLoader:
    """Pulls items from a (possibly slow, IO-bound) iterator on worker
    threads, preserving order."""

    def __init__(self, make_iter: Callable[[], Iterable], num_workers: int = 2, prefetch: int = 4):
        self._make_iter = make_iter
        self._prefetch = prefetch
        self._num_workers = num_workers

    def __iter__(self) -> Iterator:
        src = iter(self._make_iter())
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        END = object()

        def producer():
            try:
                for item in src:
                    q.put(item)
            finally:
                q.put(END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is END:
                break
            yield item


class DevicePrefetcher:
    """Wraps a host-batch iterator; issues device_put one batch ahead."""

    def __init__(self, batches: Iterable, device=None, lookahead: int = 1):
        self._batches = batches
        self._device = device or jax.devices()[0]
        self._lookahead = max(1, lookahead)

    def __iter__(self):
        import collections

        pending = collections.deque()
        it = iter(self._batches)
        try:
            for _ in range(self._lookahead):
                pending.append(self._put(next(it)))
        except StopIteration:
            pass
        while pending:
            out = pending.popleft()
            try:
                pending.append(self._put(next(it)))
            except StopIteration:
                pass
            yield out

    def _put(self, batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._device), batch
        )
