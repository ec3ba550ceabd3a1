"""Double-buffered host→device input pipeline.

The reference hides dataset IO + collation behind
`torch.utils.data.DataLoader(num_workers, collate_fn, ...)`
(`examples/ae_res.py:966-977`).  On TPU the equivalent concern is keeping
the chip fed: `PrefetchLoader` runs the (numpy) batch source in a worker
thread and keeps the next `prefetch` batches *already submitted* to the
device — `jax.device_put` dispatches asynchronously, so the H2D transfer of
batch N+1 overlaps the compute of batch N, and the training loop never
blocks on collation or PCIe/tunnel latency.

With a `sharding` (e.g. `NamedSharding(mesh, P("data"))`), arrays are
committed directly to their data-parallel layout, so the train step
consumes them without a resharding copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax

_DONE = object()


class PrefetchLoader:
    """Iterate a source of numpy pytrees as device-resident batches.

    Args:
      source: iterable yielding pytrees of numpy arrays (one batch each) —
        e.g. ``(collate_pointclouds(samples, cap) for samples in
        batch_iterator(ds, b, rng))``.
      prefetch: batches kept in flight beyond the one being consumed.
      sharding: optional `jax.sharding.Sharding` applied to every leaf
        (`None` = default device).

    The worker thread exits with the iterator; errors in the source re-raise
    at the consuming `next()` call.  Iteration is single-epoch — rebuild (or
    wrap the constructor in a loop) per epoch, matching the reference's
    fresh `DataLoader` iterator semantics.
    """

    def __init__(self, source: Iterable[Any], prefetch: int = 2,
                 sharding: Optional[jax.sharding.Sharding] = None):
        if prefetch < 1:
            raise ValueError("prefetch must be >= 1")
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def put(batch):
            # async dispatch: returns immediately, transfer runs in the
            # background while earlier batches compute
            return jax.tree.map(
                lambda a: jax.device_put(a, sharding), batch)

        def worker():
            try:
                for batch in source:
                    if self._stop.is_set():
                        return
                    self._q.put(put(batch))
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(_DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _DONE:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the worker and drain (for early loop exit)."""
        self._stop.set()
        # keep draining so a worker blocked on a full queue can observe the
        # stop flag and exit
        while self._thread.is_alive():
            try:
                self._q.get(timeout=0.1)
            except queue.Empty:
                pass
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
