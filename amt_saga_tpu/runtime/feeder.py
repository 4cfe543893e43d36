"""Host->device input pipeline (SURVEY.md §2.4: "host<->device feeding via
jax.device_put on a prefetching input pipeline").

The transcription program is device-bound; WAV loading/decoding is
host-bound (1 CPU core here).  The feeder overlaps them: a background
thread loads + pads the next batch and starts its ``jax.device_put``
while the device crunches the current one.

Also provides :func:`with_oom_retry` (SURVEY.md §5 failure handling):
on XLA RESOURCE_EXHAUSTED the batch is split in half and retried, so one
oversized batch degrades to smaller launches instead of killing a
corpus run.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence, TypeVar

import jax
import numpy as np

from ..utils.logging import get_logger

log = get_logger(__name__)

T = TypeVar("T")


def prefetch_to_device(batches: Iterable[np.ndarray], depth: int = 2,
                       sharding=None) -> Iterator[jax.Array]:
    """Iterate device-resident batches, loading ``depth`` ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _sentinel = object()

    def worker():
        try:
            for b in batches:
                q.put(jax.device_put(b, sharding))
        except BaseException as e:  # surface loader errors to the consumer
            q.put(e)
            return
        q.put(_sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def with_oom_retry(fn: Callable[[np.ndarray], Sequence[T]],
                   batch: np.ndarray, *, min_batch: int = 1
                   ) -> list[T]:
    """Run ``fn`` on ``batch``; on device OOM, halve and retry recursively."""
    try:
        return list(fn(batch))
    except jax.errors.JaxRuntimeError as e:
        msg = str(e)
        if "RESOURCE_EXHAUSTED" not in msg and "Out of memory" not in msg:
            raise
        if len(batch) <= min_batch:
            raise
        half = len(batch) // 2
        log.warning("device OOM at batch=%d; retrying as 2x%d",
                    len(batch), half)
        return (with_oom_retry(fn, batch[:half], min_batch=min_batch)
                + with_oom_retry(fn, batch[half:], min_batch=min_batch))
