"""Background-thread batch prefetcher.

The reference overlaps host data prep with GPU compute via DataLoader
workers (torch); the TPU-native equivalent is a small thread + queue ahead
of the jitted train step (host numpy augmentation is GIL-releasing numpy
work, so one thread is usually enough to hide it).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

_SENTINEL = object()


def prefetch(it: Iterator, size: int = 2) -> Iterator:
    q: queue.Queue = queue.Queue(maxsize=size)

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:                 # propagate to consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
