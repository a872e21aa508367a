"""Host->device input pipeline: background prefetch.

The reference's DataLoader ran synchronously in the training loop
(num_workers=0, train/train_large.py:118-122): tokenization/padding
blocked every step. Here a daemon thread keeps a small queue of
device-transferred batches ahead of the consumer, so host prep and the
device step overlap — the standard TPU input-pipeline shape.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax


class PrefetchIterator:
    """Wrap a host batch iterator; stage up to ``depth`` batches onto the
    device ahead of consumption. Exceptions propagate to the consumer."""

    _DONE = object()

    def __init__(self, it: Iterable, depth: int = 2, device_put=None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._put = device_put or (
            lambda b: jax.tree.map(jax.device_put, b))
        self._err = None
        self._thread = threading.Thread(target=self._work, args=(iter(it),),
                                        daemon=True)
        self._thread.start()

    def _work(self, it: Iterator):
        try:
            for batch in it:
                self._q.put(self._put(batch))
        except Exception as exc:  # propagate to consumer
            self._err = exc
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
