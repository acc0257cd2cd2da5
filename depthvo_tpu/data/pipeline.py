"""Host-side data pipeline: threaded prefetch into device memory.

Reference parity (SURVEY.md §2b(ii)): Caffe's ``base_data_layer`` +
``InternalThread`` + ``data_transformer`` prefetch the next batch on a
host thread while the GPU computes. The TPU-native equivalent keeps the
host->HBM copy off the step's critical path by double-buffering with
``jax.device_put`` onto the mesh while the previous step runs
(dispatch is async; ``device_put`` overlaps with compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator

import jax
import numpy as np

from depthvo_tpu.parallel import mesh as pmesh


def batch_iterator(
    sample_fn: Callable[[], Dict[str, np.ndarray]],
) -> Iterator[Dict[str, np.ndarray]]:
    """Wrap a zero-arg batch factory into an infinite iterator."""
    while True:
        yield sample_fn()


def prefetch_to_device(
    it: Iterator[Dict[str, np.ndarray]],
    mesh=None,
    buffer_size: int = 2,
    shard_fn: Callable[[Any, Any], Any] | None = None,
) -> Iterator[Any]:
    """Prefetch host batches onto the device/mesh on a background thread.

    The producer thread performs decode + ``device_put`` (async transfer);
    the consumer gets arrays that are already on (or in flight to) the
    device — the training loop never blocks on host work unless the
    producer falls behind by ``buffer_size`` batches.

    ``shard_fn(batch, mesh)`` overrides the placement (default
    ``parallel.mesh.shard_batch``; scan-mode super-batches pass
    ``shard_stacked_batch`` so the PER-STEP batch axis is the sharded one).

    Failure semantics (Caffe's InternalThread aborts the process on a
    decode error; here the error crosses the thread): an exception in the
    producer (corrupt PNG, shard failure) RE-RAISES in the consumer
    instead of masquerading as clean end-of-iteration. A consumer that
    abandons the generator unblocks and stops the producer (no thread or
    queued-HBM-batch leak).
    """
    if mesh is None:
        mesh = pmesh.make_mesh(1)
    if shard_fn is None:
        shard_fn = pmesh.shard_batch
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()
    _END = object()

    def producer():
        try:
            for batch in it:
                if stop.is_set():
                    return
                item = shard_fn(batch, mesh)
                # Bounded put so an abandoned consumer cannot strand the
                # thread inside q.put forever (it re-checks `stop`).
                while True:
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        if stop.is_set():
                            return
        except BaseException as e:  # propagate, don't fake end-of-data
            q.put(e)
            return
        q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise RuntimeError(
                    "prefetch producer thread failed; see cause"
                ) from item
            yield item
    finally:
        stop.set()
        # Drain one slot so a producer blocked on a full queue can see
        # `stop` and exit promptly.
        try:
            q.get_nowait()
        except queue.Empty:
            pass
