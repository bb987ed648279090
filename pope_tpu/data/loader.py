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


class _Raise:
    """Exception captured on a loader thread, re-raised at the consumer."""

    def __init__(self, exc):
        self.exc = exc


class ThreadedLoader:
    """Pulls items from a (possibly slow, IO-bound) iterator on worker
    threads, preserving order.

    Without `fn` (or with num_workers=1), one producer thread drains the
    source iterator into a bounded queue, applying `fn` inline. With `fn`
    and num_workers>1, worker threads pull items from the source under a
    lock and apply `fn` CONCURRENTLY — results are re-assembled in source
    order. The pool exists for upload-bandwidth-bound deployments (parallel
    h2d streams measured +30-60% raw bandwidth through the tunnel); on
    this box the eval driver measured FASTER single-producer (concurrent
    device_put RPCs contend with program dispatch — ROADMAP r4 A/B), so
    callers default to num_workers=1."""

    def __init__(self, make_iter: Callable[[], Iterable], num_workers: int = 2,
                 prefetch: int = 4, fn: Optional[Callable] = None):
        self._make_iter = make_iter
        self._prefetch = prefetch
        self._num_workers = max(1, num_workers)
        self._fn = fn

    def __iter__(self) -> Iterator:
        if self._fn is None or self._num_workers == 1:
            yield from self._single_producer()
        else:
            yield from self._worker_pool()

    def _single_producer(self):
        src = iter(self._make_iter())
        fn = self._fn
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        END = object()

        def producer():
            try:
                for item in src:
                    q.put(item if fn is None else fn(item))
            except BaseException as e:  # surfaced at the consumer, not lost
                q.put(_Raise(e))
            finally:
                q.put(END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is END:
                break
            if isinstance(item, _Raise):
                raise item.exc
            yield item

    def _worker_pool(self):
        src = iter(self._make_iter())
        src_lock = threading.Lock()
        results: dict = {}
        cv = threading.Condition()
        # in-flight budget: results waiting + being computed never exceed
        # prefetch + workers, bounding host/device memory
        budget = threading.Semaphore(self._prefetch + self._num_workers)
        state = {"next_seq": 0, "n_exited": 0}

        def worker():
            while True:
                budget.acquire()
                with src_lock:
                    try:
                        item = next(src)
                        seq = state["next_seq"]
                        state["next_seq"] += 1
                    except BaseException as e:  # StopIteration or source error
                        budget.release()
                        with cv:
                            if not isinstance(e, StopIteration):
                                state["error"] = e
                            state["n_exited"] += 1
                            cv.notify_all()
                        return
                try:
                    out = self._fn(item)
                except BaseException as e:  # surfaced at the consumer, in order
                    out = _Raise(e)
                with cv:
                    results[seq] = out
                    cv.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self._num_workers)
        ]
        for t in threads:
            t.start()

        nxt = 0
        while True:
            with cv:
                while nxt not in results:
                    # every exited worker has already deposited its last
                    # result, so all-exited + result absent => stream done
                    if state["n_exited"] == len(threads):
                        if "error" in state:
                            raise state["error"]
                        return
                    cv.wait(timeout=0.1)
                out = results.pop(nxt)
            nxt += 1
            budget.release()
            if isinstance(out, _Raise):
                raise out.exc
            yield out


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
