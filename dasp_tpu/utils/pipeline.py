"""Host input pipeline: threaded batch production + device prefetch.

The reference feeds training with ``DataLoader(num_workers=8)``
(ref style_transfer.py:401-406) — worker processes produce batches while
the accelerator computes. The JAX-native equivalent here is two
composable pieces:

* :func:`threaded_iterator` — N daemon threads each run their own batch
  source (host-side numpy work: synthesis, wav decode, slicing) into a
  bounded queue. Threads suffice where torch needs processes: the hot
  host work is numpy, which releases the GIL.
* :func:`device_prefetch` — stages the next ``size`` batches on the
  device with async ``jax.device_put`` so host->device transfer overlaps
  the current step's compute (double buffering at size=2).

Typical use::

    it = device_prefetch(threaded_iterator(make_source, num_workers=4))
    for batch in it:          # batch is already device-resident
        state = step(state, batch)

Ordering across workers is first-come (nondeterministic under load);
give each worker an independently seeded RNG.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterator, Optional

import jax

__all__ = ["threaded_iterator", "device_prefetch"]


def threaded_iterator(
    source_factory: Callable[[int], Iterator],
    num_workers: int = 2,
    prefetch: int = 4,
) -> Iterator:
    """Merge batches from ``num_workers`` threaded sources into one stream.

    Args:
        source_factory: called once per worker with the worker id; must
            return an iterator of batches. Seed any RNG from the id so
            workers don't duplicate data.
        num_workers: number of producer threads.
        prefetch: max batches buffered ahead of the consumer.

    Yields:
        Batches in arrival order. A worker whose source raises re-raises
        the exception at the consumer on the next pull; a worker whose
        source is exhausted just stops contributing (iteration ends once
        all workers are done and the buffer drains).
    """
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _DONE = object()

    def worker(wid: int):
        try:
            for b in source_factory(wid):
                q.put(b)
        except BaseException as e:  # surface worker failures to the consumer
            q.put((_DONE, e))
            return
        q.put((_DONE, None))

    for w in range(num_workers):
        threading.Thread(target=worker, args=(w,), daemon=True).start()

    done = 0
    while done < num_workers:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _DONE:
            done += 1
            if item[1] is not None:
                raise item[1]
            continue
        yield item


def device_prefetch(it: Iterator, size: int = 2, device: Optional[object] = None) -> Iterator:
    """Keep ``size`` batches staged on the device ahead of the consumer.

    ``jax.device_put`` dispatches the transfer asynchronously, so while
    the consumer's current step computes, the next batches are already in
    flight over PCIe/ICI. Works on arrays and pytrees of arrays.
    """
    assert size >= 1
    buf: "collections.deque" = collections.deque()
    for b in it:
        buf.append(jax.device_put(b, device))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
