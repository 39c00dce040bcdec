"""Mini-batch dataset iteration with native-accelerated assembly.

The reference trains via ``Model.fit`` over zero-copy views in storage order
(model.nim:437-449, no shuffling).  ``Batches`` adds the standard epoch
pipeline: a native Fisher-Yates permutation + row-gather per epoch (see
native/egtpu_native.cpp), which keeps the single host core feeding the TPU.
"""

from __future__ import annotations

from typing import Iterator

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


def fit_epochs(model, target: str, batches: Batches, epochs: int = 1) -> None:
    """Train ``target`` for several epochs over shuffled batches."""
    for _ in range(epochs):
        model.epoch += 1
        for batch in batches:
            model.apply(target, batch)
