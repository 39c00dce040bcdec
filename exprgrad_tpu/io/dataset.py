"""Mini-batch dataset iteration with native-accelerated assembly.

The reference trains via ``Model.fit`` over zero-copy views in storage order
(model.nim:437-449, no shuffling).  ``Batches`` adds the standard epoch
pipeline: a native Fisher-Yates permutation + row-gather per epoch (see
native/egtpu_native.cpp), which keeps the single host core feeding the TPU.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..utils.native import gather_rows, shuffle_indices


class Batches:
    """Iterate aligned mini-batches over equally-sized leading dimensions."""

    def __init__(
        self,
        tensors: dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_tail: bool = True,
    ) -> None:
        sizes = {v.shape[0] for v in tensors.values()}
        if len(sizes) != 1:
            raise ValueError("all dataset tensors need the same sample count")
        self.tensors = tensors
        self.count = sizes.pop()
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_tail = drop_tail
        self.epoch = 0

    def __len__(self) -> int:
        if self.drop_tail:
            return self.count // self.batch_size
        return -(-self.count // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        self.epoch += 1
        order = None
        if self.shuffle:
            order = shuffle_indices(self.count, self.seed + self.epoch)
        for batch in range(len(self)):
            lo = batch * self.batch_size
            hi = min(lo + self.batch_size, self.count)
            if order is None:
                yield {k: v[lo:hi] for k, v in self.tensors.items()}
            else:
                idx = order[lo:hi]
                yield {k: gather_rows(v, idx) for k, v in self.tensors.items()}


class Prefetcher:
    """Async input pipeline: assemble + place the NEXT batch while the
    device computes the CURRENT one.

    A background thread pulls batches from any iterable of
    ``{name: array}`` dicts, casts them to ``dtype`` and (when
    ``to_device``) ``jax.device_put``\\ s them — onto ``placement`` (a
    ``jax.Device`` or a ``jax.sharding.Sharding``, e.g. a dp-sharded
    ``NamedSharding`` for mesh training) or the default device.  The
    classic TPU double-buffering recipe: since JAX dispatch is async,
    the host-side gather/cast/transfer of batch *k+1* overlaps the
    device execution of batch *k* instead of serializing behind it
    (the reference's fit loop is fully synchronous, model.nim:437-449;
    on a single-core host feeding a network-tunneled TPU the overlap is
    the difference between the chip idling and not).

    ``depth`` bounds the queue: at most ``depth`` placed batches are
    in flight, so host/device memory stays bounded for any dataset
    size.  Exceptions in the producer re-raise at the consuming site;
    abandoning the iterator mid-epoch stops the thread promptly.
    """

    _STOP = object()

    def __init__(
        self,
        batches,
        depth: int = 2,
        dtype: Optional[np.dtype] = None,
        placement=None,
        to_device: bool = True,
    ) -> None:
        if depth < 1:
            raise ValueError("prefetch depth must be >= 1")
        self.batches = batches
        self.depth = depth
        self.dtype = dtype
        self.placement = placement
        self.to_device = to_device

    def __len__(self) -> int:
        return len(self.batches)

    def _place(self, batch: dict[str, np.ndarray]) -> dict:
        out = {}
        for name, value in batch.items():
            arr = np.ascontiguousarray(value, dtype=self.dtype)
            if self.to_device:
                import jax

                if self.placement is not None:
                    arr = jax.device_put(arr, self.placement)
                else:
                    arr = jax.device_put(arr)
            out[name] = arr
        return out

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that aborts when the consumer went away
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for batch in self.batches:
                    if not put(self._place(batch)):
                        return
                put(self._STOP)
            except BaseException as exc:  # re-raised at the consumer
                put(exc)

        thread = threading.Thread(
            target=producer, name="egtpu-prefetch", daemon=True
        )
        thread.start()
        try:
            while True:
                item = q.get()
                if item is self._STOP:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # free one slot so a producer blocked in put() can observe
            # the stop flag and exit
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=10.0)


def fit_epochs(
    model, target: str, batches: Batches, epochs: int = 1, prefetch: int = 0
) -> None:
    """Train ``target`` for several epochs over shuffled batches.

    ``prefetch > 0`` drives the epoch through a :class:`Prefetcher` of
    that depth: batch assembly and host->device transfer of the next
    batch overlap the device step of the current one (jax backend; the
    placed arrays feed the jitted executor without a host round trip).
    """
    dtype = np.dtype(model.program.scalar_type.value)
    use_prefetch = prefetch > 0 and getattr(model, "backend", "jax") == "jax"
    for _ in range(epochs):
        model.epoch += 1
        it = (
            Prefetcher(batches, depth=prefetch, dtype=dtype)
            if use_prefetch
            else batches
        )
        for batch in it:
            model.apply(target, batch)
