"""Two-stream semi-supervised batch composition.

Deterministic generator re-design of `TwoStreamBatchSampler`
(`dataloaders/dataset.py:280-307`): each batch is ``primary_bs`` labeled
indices (primary stream, reshuffled once per epoch) followed by
``secondary_bs`` unlabeled indices (secondary stream, infinite reshuffle).
One epoch = one pass over the primary indices. All randomness comes from an
explicit ``np.random.Generator``.

The reference's buggy `ThreeStreamBatchSampler` (`dataset.py:310-338`,
shadowed tuple unpacking; never used by any entry point) is deliberately
not reproduced.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np


class TwoStreamBatchSampler:
    def __init__(self, primary_indices: Sequence[int],
                 secondary_indices: Sequence[int], batch_size: int,
                 secondary_batch_size: int, seed: int = 0):
        self.primary_indices = list(primary_indices)
        self.secondary_indices = list(secondary_indices)
        self.secondary_batch_size = secondary_batch_size
        self.primary_batch_size = batch_size - secondary_batch_size
        assert len(self.primary_indices) >= self.primary_batch_size > 0
        assert len(self.secondary_indices) >= self.secondary_batch_size > 0
        self._rng = np.random.default_rng(seed)
        self._secondary_pool: List[int] = []

    def __len__(self) -> int:
        return len(self.primary_indices) // self.primary_batch_size

    def _next_secondary(self, n: int) -> List[int]:
        while len(self._secondary_pool) < n:
            self._secondary_pool.extend(
                self._rng.permutation(self.secondary_indices).tolist())
        out, self._secondary_pool = (self._secondary_pool[:n],
                                     self._secondary_pool[n:])
        return out

    def epoch(self) -> Iterator[Tuple[List[int], List[int]]]:
        """Yield (labeled_idxs, unlabeled_idxs) batches for one epoch."""
        primary = self._rng.permutation(self.primary_indices).tolist()
        for i in range(len(self)):
            lab = primary[i * self.primary_batch_size:
                          (i + 1) * self.primary_batch_size]
            unlab = self._next_secondary(self.secondary_batch_size)
            yield lab, unlab

    def __iter__(self):
        for lab, unlab in self.epoch():
            yield lab + unlab


def two_stream_batches(primary_indices, secondary_indices, batch_size,
                       secondary_batch_size, seed=0):
    """Infinite stream of (labeled, unlabeled) index batches across
    epochs — what the trainer's `while iter < max` loop consumes."""
    sampler = TwoStreamBatchSampler(primary_indices, secondary_indices,
                                    batch_size, secondary_batch_size, seed)
    while True:
        yield from sampler.epoch()
