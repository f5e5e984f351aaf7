"""Host->device streaming utilities (SURVEY.md §5.7, BASELINE.json:11
"batch 64 streaming").

The TPU-native shape of the reference's DataLoader role: a background
thread prepares host batches (JPEG decode / letterbox / collate — the only
work that cannot run on device) and issues **async** ``jax.device_put``s a
fixed depth ahead, so the transfer of batch i+1 overlaps the device
compute of batch i. The consumer sees device-resident arrays and never
blocks on the wire unless the feed itself is the bottleneck.

Used by ``evaluation.pipeline.evaluate`` (overlaps cv2 letterbox + transfer
with the fused device program) and usable standalone for serving loops.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

import jax

T = TypeVar("T")

_STOP = object()


def prefetch_to_device(host_batches: Iterable[T], depth: int = 2,
                       device=None,
                       put: Optional[Callable[[T], T]] = None) -> Iterator[T]:
    """Iterate ``host_batches`` with a background thread running ``put``
    (default: ``jax.device_put`` of every array leaf) ``depth`` items ahead.

    ``depth=2`` is classic double buffering: one batch in flight on the
    wire while one executes. Exceptions in the producer (including in the
    underlying iterable) are re-raised at the consumer's next step.
    """
    if put is None:
        def put(item):
            return jax.tree.map(lambda x: jax.device_put(x, device), item)

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    err = []

    def q_put(item) -> bool:
        """put that gives up when the consumer abandoned the iterator —
        otherwise an early consumer exit would leave this thread blocked
        forever holding device buffers."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def feeder():
        try:
            for item in host_batches:
                if stop.is_set() or not q_put(put(item)):
                    return
        except BaseException as e:  # surface in consumer
            err.append(e)
        finally:
            q_put(_STOP)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _STOP:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # unblock + terminate the feeder on early exit
