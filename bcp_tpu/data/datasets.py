"""HDF5-backed dataset readers for the three pipelines.

Same on-disk layouts and split-list conventions as the reference
(`dataloaders/dataset.py:15-126`, `pancreas/dataloaders.py:110-174`), so a
user's existing preprocessed data directories work unchanged:

- LA:        <root>/train.list, <root>/test.list,
             <root>/2018LA_Seg_Training Set/<case>/mri_norm2.h5
- ACDC:      <root>/train_slices.list, <root>/val.list, <root>/test.list,
             <root>/data/slices/<case>.h5 (train), <root>/data/<case>.h5
- pancreas:  list files <lists>/{train_lab,train_unlab,test}.txt with
             h5 paths relative to <root>
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import h5py
import numpy as np

from bcp_tpu.config import Config
from bcp_tpu.data import transforms


#: vendored copies of the reference's `data_split/` lists (the exact
#: case orders behind the paper's 8/80, 4/80 and 7-patient experiments);
#: see bcp_tpu/data/splits/README.md
VENDORED_SPLITS = os.path.join(os.path.dirname(__file__), "splits")


def read_list(path: str) -> List[str]:
    with open(path, "r") as f:
        return [line.strip() for line in f if line.strip()]


def _split_list_path(base_dir: str, name: str, dataset: str) -> str:
    """Resolve a split list: the data root first (the reference's layout,
    `dataloaders/dataset.py:96-102`), falling back to the vendored
    `data_split/` copies so the published splits work without the user
    recreating the list files."""
    primary = os.path.join(base_dir, name)
    if os.path.exists(primary):
        return primary
    vendored = os.path.join(VENDORED_SPLITS, dataset, name)
    if os.path.exists(vendored):
        return vendored
    return primary   # let the open() error name the expected location


def _read_h5(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with h5py.File(path, "r") as f:
        return f["image"][:], f["label"][:]


class _VolumeCache:
    """Decompressed-volume RAM cache. The reference re-reads + re-gunzips
    the full h5 volume for every crop (`dataloaders/dataset.py:116-121`,
    4 worker processes compensating); with the train step at ~0.3s the
    host must not spend ~0.5s per sample in gzip. Whole LA/pancreas train
    sets are a few GB decompressed — cache them."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._store = {}

    def get(self, path: str):
        if not self.enabled:
            return _read_h5(path)
        if path not in self._store:
            self._store[path] = _read_h5(path)
        return self._store[path]


class LAHeartDataset:
    """`LAHeart` (`dataloaders/dataset.py:91-126`)."""

    def __init__(self, base_dir: str, split: str = "train",
                 num: Optional[int] = None, cache: bool = True):
        self.base_dir = base_dir
        list_path = _split_list_path(base_dir, f"{split}.list", "LA")
        self.cases = read_list(list_path)
        if num is not None:
            self.cases = self.cases[:num]
        self._cache = _VolumeCache(cache)

    def __len__(self):
        return len(self.cases)

    def case_path(self, idx: int) -> str:
        return os.path.join(self.base_dir, "2018LA_Seg_Training Set",
                            self.cases[idx], "mri_norm2.h5")

    def load(self, idx: int):
        return self._cache.get(self.case_path(idx))

    def sample_train(self, idx: int, patch_size, rng):
        image, label = self.load(idx)
        return transforms.la_train_transform(image, label, patch_size, rng)


class ACDCDataset:
    """`BaseDataSets` (`dataloaders/dataset.py:15-50`)."""

    def __init__(self, base_dir: str, split: str = "train",
                 num: Optional[int] = None, cache: bool = True):
        self.base_dir = base_dir
        self.split = split
        list_name = {"train": "train_slices.list", "val": "val.list",
                     "test": "test.list"}[split]
        self.cases = read_list(_split_list_path(base_dir, list_name,
                                                "ACDC"))
        if num is not None and split == "train":
            self.cases = self.cases[:num]
        self._cache = _VolumeCache(cache)

    def __len__(self):
        return len(self.cases)

    def case_path(self, idx: int) -> str:
        case = self.cases[idx]
        if self.split == "train":
            return os.path.join(self.base_dir, "data", "slices",
                                f"{case}.h5")
        return os.path.join(self.base_dir, "data", f"{case}.h5")

    def load(self, idx: int):
        return self._cache.get(self.case_path(idx))

    def sample_train(self, idx: int, patch_size, rng):
        image, label = self.load(idx)
        return transforms.acdc_random_generator(image, label, patch_size,
                                                rng)


class PancreasDataset:
    """`Pancreas` (`pancreas/dataloaders.py:110-174`).

    ``oversample`` reproduces the labeled-set x5/x10 __len__ trick
    (`pancreas/dataloaders.py:156-162`); ``reverse`` gives the
    backwards-iterating mix-pair loader (`:164-167`).
    """

    def __init__(self, base_dir: str, split: str, lists_dir: Optional[str]
                 = None, oversample: int = 1, reverse: bool = False,
                 cache: bool = True):
        self.base_dir = base_dir
        lists_dir = lists_dir or base_dir
        name = {"train_lab": "train_lab.txt",
                "train_unlab": "train_unlab.txt",
                "test": "test.txt"}[split]
        self.rel_paths = read_list(os.path.join(lists_dir, name))
        self.split = split
        self.oversample = oversample
        self.reverse = reverse
        self._cache = _VolumeCache(cache)

    def __len__(self):
        return len(self.rel_paths) * self.oversample

    def case_path(self, idx: int) -> str:
        n = len(self.rel_paths)
        i = idx % n
        if self.reverse:
            i = n - (idx % n) - 1
        return os.path.join(self.base_dir, self.rel_paths[i])

    def load(self, idx: int):
        return self._cache.get(self.case_path(idx))

    def sample_train(self, idx: int, patch_size, rng):
        image, label = self.load(idx)
        if self.split == "train_lab":
            return transforms.pancreas_train_transform(image, label,
                                                       patch_size, rng)
        # unlabeled stream uses the CenterCrop "test transform"
        # (`pancreas/dataloaders.py:145`)
        return transforms.pancreas_test_transform(image, label, patch_size)


def build_dataset(cfg: Config, split: str):
    if cfg.variant == "la":
        return LAHeartDataset(cfg.root_path, split)
    if cfg.variant == "acdc":
        return ACDCDataset(cfg.root_path, split)
    if cfg.variant == "pancreas":
        return PancreasDataset(cfg.root_path, split)
    raise ValueError(cfg.variant)
