"""Two-stream semi-supervised batch composition.

Deterministic generator re-design of `TwoStreamBatchSampler`
(`dataloaders/dataset.py:280-307`): each batch is ``primary_bs`` labeled
indices (primary stream, reshuffled once per epoch) followed by
``secondary_bs`` unlabeled indices (secondary stream, infinite reshuffle).
One epoch = one pass over the primary indices. All randomness comes from an
explicit ``np.random.Generator``.

`ThreeStreamBatchSampler` below is the corrected form of the reference's
unused three-stream variant (`dataset.py:310-338`); see its docstring for
the two reference bugs it repairs.
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


class ThreeStreamBatchSampler:
    """Corrected `ThreeStreamBatchSampler` (`dataloaders/dataset.py:310-338`).

    The reference version (never used by any entry point) composes each
    batch as ``primary_chunk + secondary_chunk + primary_chunk`` where both
    primary groupers pull from the *same* single-pass iterator — so the two
    labeled sub-batches are consecutive disjoint chunks of one epoch
    permutation. Reproduced here, minus two reference bugs:

    - the generator expression unpacks into a shadowed ``primary_batch``
      name twice (`dataset.py:332-333`), so the name is last bound to the
      THIRD zip element and the reference actually yields
      ``chunk_b + secondary + chunk_b`` — the first labeled chunk is
      consumed and dropped and both labeled sub-batches are identical.
      This implementation deliberately yields the evidently-intended
      disjoint ``(lab_a, unlab, lab_b)`` instead.
    - ``__len__`` claims ``len(primary) // primary_bs`` batches
      (`dataset.py:337-338`) but iteration actually exhausts the primary
      pass twice as fast; ``__len__`` here reports the real batch count.
    """

    def __init__(self, primary_indices: Sequence[int],
                 secondary_indices: Sequence[int], batch_size: int,
                 secondary_batch_size: int, seed: int = 0):
        self.primary_indices = list(primary_indices)
        self.secondary_indices = list(secondary_indices)
        self.secondary_batch_size = secondary_batch_size
        self.primary_batch_size = batch_size - secondary_batch_size
        assert len(self.primary_indices) >= 2 * self.primary_batch_size > 0
        assert len(self.secondary_indices) > 0
        assert self.secondary_batch_size > 0
        self._rng = np.random.default_rng(seed)
        self._secondary_pool: List[int] = []

    def __len__(self) -> int:
        return len(self.primary_indices) // (2 * self.primary_batch_size)

    def epoch(self) -> Iterator[Tuple[List[int], List[int], List[int]]]:
        """Yield (labeled_a, unlabeled, labeled_b) index batches."""
        perm = self._rng.permutation(self.primary_indices).tolist()
        n = self.primary_batch_size
        for i in range(len(self)):
            lab_a = perm[2 * i * n:(2 * i + 1) * n]
            lab_b = perm[(2 * i + 1) * n:(2 * i + 2) * n]
            while len(self._secondary_pool) < self.secondary_batch_size:
                self._secondary_pool.extend(
                    self._rng.permutation(self.secondary_indices).tolist())
            unlab = self._secondary_pool[:self.secondary_batch_size]
            del self._secondary_pool[:self.secondary_batch_size]
            yield lab_a, unlab, lab_b

    def __iter__(self):
        for lab_a, unlab, lab_b in self.epoch():
            yield lab_a + unlab + lab_b


def two_stream_batches(primary_indices, secondary_indices, batch_size,
                       secondary_batch_size, seed=0):
    """Infinite stream of (labeled, unlabeled) index batches across
    epochs — what the trainer's `while iter < max` loop consumes."""
    sampler = TwoStreamBatchSampler(primary_indices, secondary_indices,
                                    batch_size, secondary_batch_size, seed)
    while True:
        yield from sampler.epoch()
