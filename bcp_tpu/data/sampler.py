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
    """``primary_batch_size`` may exceed ``len(primary_indices)`` when a
    data-parallel mesh scales the global batch (Config.num_devices > 1 on
    e.g. LA's 8 labeled volumes): the primary stream then refills from
    fresh permutations mid-batch, exactly like the secondary stream — for
    the unscaled case the drawn sequence is bit-identical to the
    reference's one-permutation-per-epoch slicing."""

    def __init__(self, primary_indices: Sequence[int],
                 secondary_indices: Sequence[int], batch_size: int,
                 secondary_batch_size: int, seed: int = 0):
        self.primary_indices = list(primary_indices)
        self.secondary_indices = list(secondary_indices)
        self.secondary_batch_size = secondary_batch_size
        self.primary_batch_size = batch_size - secondary_batch_size
        assert len(self.primary_indices) > 0 and self.primary_batch_size > 0
        assert len(self.secondary_indices) > 0
        assert self.secondary_batch_size > 0
        self._rng = np.random.default_rng(seed)
        self._primary_pool: List[int] = []
        self._secondary_pool: List[int] = []

    def __len__(self) -> int:
        return max(len(self.primary_indices) // self.primary_batch_size, 1)

    def _next(self, pool: List[int], indices: List[int],
              n: int) -> List[int]:
        while len(pool) < n:
            pool.extend(self._rng.permutation(indices).tolist())
        out = pool[:n]
        del pool[:n]
        return out

    def epoch(self) -> Iterator[Tuple[List[int], List[int]]]:
        """Yield (labeled_idxs, unlabeled_idxs) batches for one epoch."""
        # the reference's grouper drops the sub-batch remainder of each
        # epoch's permutation (`dataset.py:340-355`); only the secondary
        # stream's pool persists across epochs (`iterate_eternally`)
        self._primary_pool = []
        for _ in range(len(self)):
            lab = self._next(self._primary_pool, self.primary_indices,
                             self.primary_batch_size)
            unlab = self._next(self._secondary_pool, self.secondary_indices,
                               self.secondary_batch_size)
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
