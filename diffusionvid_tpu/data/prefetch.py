"""Threaded prefetching around the host-side sample/chunk producers.

The reference feeds the GPU through a torch DataLoader with
``NUM_WORKERS=16`` C++-backed worker processes (``DATALOADER.NUM_WORKERS``,
``data/build.py``).  Here the decode/resize work (cv2 — C++ under the GIL
release) runs in a thread pool that keeps a bounded queue of ready batches
ahead of the device, overlapping host IO with TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class PrefetchIterator:
    """Wrap any iterator with a background-thread bounded prefetch queue.

    On a single-CPU host threads cannot overlap anything and the GIL
    ping-pong between producer/consumer is ruinous (measured 27 →
    140 ms/frame through a 3-thread pipeline) — there the wrapper
    degrades to a plain pass-through."""

    _END = object()

    def __init__(self, iterator: Iterator, depth: int = 4):
        import os

        self._passthrough = (os.cpu_count() or 1) <= 1
        self._closed = False
        if self._passthrough:
            self._it = iter(iterator)
            return
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, args=(iterator,),
                                        daemon=True)
        self._thread.start()

    def _fill(self, iterator):
        try:
            for item in iterator:
                # bounded put with a shutdown check: an abandoned consumer
                # (e.g. run_inference breaking at max_videos) must not
                # leave this thread blocked holding decoded frames forever
                while not self._closed:
                    try:
                        self._q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._closed:
                    return
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            try:
                self._q.put_nowait(self._END)
            except queue.Full:
                pass

    def close(self):
        """Stop the producer and release its buffers (idempotent)."""
        self._closed = True
        if not self._passthrough:
            # drain so a producer blocked in put() can observe _closed
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass

    def __iter__(self):
        return self

    def __next__(self):
        if self._passthrough:
            return next(self._it)
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_map(fn: Callable, items, workers: int = 8, depth: int = 16):
    """Ordered parallel map with bounded lookahead: a thread pool evaluates
    ``fn(item)`` ahead of consumption (the NUM_WORKERS analogue for the
    per-sample decode pipeline).

    Workers are capped at the CPU count: on a single-core host extra
    threads only add GIL/switch overhead (measured 22 → 61 ms/frame for
    cv2 decode), while one worker still overlaps decode with device
    compute."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(workers, os.cpu_count() or 1))
    depth = max(depth, workers)
    if (os.cpu_count() or 1) <= 1:
        # single CPU: no overlap possible, threads only add GIL churn
        return (fn(x) for x in items)

    def gen():
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = []
            it = iter(items)
            try:
                for _ in range(depth):
                    pending.append(pool.submit(fn, next(it)))
            except StopIteration:
                it = None
            while pending:
                out = pending.pop(0).result()
                if it is not None:
                    try:
                        pending.append(pool.submit(fn, next(it)))
                    except StopIteration:
                        it = None
                yield out

    return gen()
