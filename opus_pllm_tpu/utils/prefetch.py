"""Host->device input prefetching for the training loops.

JAX dispatch is already asynchronous, so the device never waits for Python
BETWEEN steps it has already been fed — what stalls a TPU step loop is the
host-side work of producing the NEXT batch (tokenization, numpy collation,
disk reads: the role torch's DataLoader workers play in the reference's
trainers). `prefetch_to_device` moves that work onto a background thread
and keeps `size` batches already transferred (device_put is itself async)
ahead of the consumer, so the step loop's iterator never blocks on data
preparation.

Thread-safety: the producer thread only touches host numpy + device_put;
jit compilation/execution stays on the consumer thread. Exceptions in the
producer re-raise at the consumer's next __next__ (no silent truncation).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax

_END = object()


def prefetch_to_device(batches: Iterable, size: int = 2,
                       place: Optional[Callable] = None) -> Iterator:
    """Iterate `batches` on a background thread, staging each with `place`
    (default: jax.device_put of the pytree) and keeping up to `size`
    staged batches ahead. Yields in order; re-raises producer errors.

    place: optional callable batch -> staged batch (e.g. a shard_batch
    closure for mesh training). Runs on the producer thread.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    place = place or (lambda b: jax.tree.map(jax.device_put, b))
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []
    abandoned = threading.Event()

    def produce():
        try:
            for b in batches:
                staged = place(b)
                # bounded put that re-checks for an abandoned consumer: a
                # consumer that stops iterating early (train-step raise,
                # partial loop) must not leave this thread blocked forever
                # pinning `size` staged device batches + the dataset
                # iterator for the life of the process
                while not abandoned.is_set():
                    try:
                        q.put(staged, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if abandoned.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            err.append(e)
        finally:
            # the sentinel must be DELIVERED on normal completion (a full
            # queue just means the consumer is still draining), but must
            # not block forever if the consumer is gone
            while not abandoned.is_set():
                try:
                    q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=produce, daemon=True,
                         name="opus-pllm-prefetch")
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
        abandoned.set()
