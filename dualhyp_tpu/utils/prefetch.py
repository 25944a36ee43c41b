"""Background-thread prefetch for host -> device pipelines.

The make_json CLIs interleave heavy host work (wav/video load, noise
mixing, occlusion replay, 30-s STFT) with device beam decode; run
sequentially, the device idles while the host prepares the next batch.
`prefetch` runs the host-side batch generator in ONE producer thread
with a bounded queue, overlapping preparation of batch N+1 with decode
of batch N (numpy FFT and image ops release the GIL). A single producer
preserves the generator's rng draw order, so outputs stay bit-identical
to the sequential loop. The reference drives its GPU pipeline fully
synchronously (ref: data/make_json_asr.py:94-128).
"""

from __future__ import annotations

import queue
import threading

_DONE = object()


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(gen, depth: int = 2):
    """Yield items of `gen` in order, producing them in a background
    thread up to `depth` items ahead. Exceptions inside `gen` re-raise
    at the consumption point. Closing the returned generator early
    (break / .close()) stops the producer promptly."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def run():
        try:
            for item in gen:
                while True:
                    if stop.is_set():
                        return
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # re-raised by the consumer
            q.put(_Raised(exc))
            return
        q.put(_DONE)

    producer = threading.Thread(
        target=run, name="dualhyp-prefetch", daemon=True
    )
    producer.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                break
            if isinstance(item, _Raised):
                raise item.exc
            yield item
        producer.join()
    finally:
        stop.set()
