"""Double-buffered host -> device prefetch.

The trainer consumes whole stacked epochs (one lax.scan per epoch); this
iterator assembles the NEXT epoch on a background thread (native sampler
when built) and ships it to device while the current epoch is still
executing, so the accelerator never waits on the host (the reference's
DataLoader runs with num_workers=0 — fully synchronous).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax

from .dataset import RandomChunkDataset, epoch_arrays


def prefetch_epochs(dataset: RandomChunkDataset, batch_size: int,
                    num_epochs: int, num_batches: Optional[int] = None,
                    buffer_size: int = 2, device=None
                    ) -> Iterator[Tuple]:
    """Yields (xs, us, lengths) device arrays for each epoch, produced
    ahead of consumption on a daemon thread."""
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def put_unless_stopped(item) -> bool:
        # a plain q.put would block forever on a full queue after the
        # consumer stopped early (stop is only observable between puts),
        # leaking this thread and the device arrays it holds
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # a producer crash must reach the consumer as an exception: a bare
        # end sentinel would end the stream cleanly and training would
        # silently finish with fewer epochs than requested
        try:
            for _ in range(num_epochs):
                if stop.is_set():
                    return
                arrays = epoch_arrays(dataset, batch_size, num_batches)
                arrays = tuple(jax.device_put(a, device) for a in arrays)
                if not put_unless_stopped(arrays):
                    return
            put_unless_stopped(None)
        except BaseException as e:  # noqa: BLE001 — re-raised by consumer
            put_unless_stopped(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
