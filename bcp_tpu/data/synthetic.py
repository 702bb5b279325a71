"""Synthetic dataset generators in the reference on-disk layouts.

For tests and smoke-training (the reference ships no fixtures at all —
SURVEY.md §4). Volumes are noisy backgrounds with one bright ellipsoid
blob whose voxels are the foreground class, so a few hundred steps of
training measurably raises Dice.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import h5py
import numpy as np


def _blob_volume(rng: np.random.Generator, shape: Sequence[int],
                 n_classes: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    coords = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    image = rng.normal(0.0, 0.3, size=tuple(shape)).astype(np.float32)
    label = np.zeros(tuple(shape), np.uint8)
    for c in range(1, n_classes):
        center = [rng.uniform(0.3, 0.7) * s for s in shape]
        radii = [max(2.0, rng.uniform(0.12, 0.22) * s) for s in shape]
        d = sum(((g - c0) / r0) ** 2 for g, c0, r0 in
                zip(coords, center, radii))
        blob = d <= 1.0
        label[blob] = c
        image[blob] += 0.8 + 0.4 * c
    return image, label


def make_la_dataset(root: str, n_train: int = 6, n_test: int = 2,
                    shape=(64, 64, 48), seed: int = 0) -> str:
    """LA layout: <root>/{train,test}.list +
    <root>/2018LA_Seg_Training Set/<case>/mri_norm2.h5."""
    rng = np.random.default_rng(seed)
    names = [f"synth_case_{i:03d}" for i in range(n_train + n_test)]
    for name in names:
        d = os.path.join(root, "2018LA_Seg_Training Set", name)
        os.makedirs(d, exist_ok=True)
        image, label = _blob_volume(rng, shape)
        with h5py.File(os.path.join(d, "mri_norm2.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
    with open(os.path.join(root, "train.list"), "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(os.path.join(root, "test.list"), "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
    return root


def make_acdc_dataset(root: str, n_train_slices: int = 24, n_val: int = 2,
                      slice_shape=(64, 64), vol_depth: int = 4,
                      n_classes: int = 4, seed: int = 0) -> str:
    """ACDC layout: per-slice train h5 under data/slices/, full volumes
    under data/, lists at the root."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data", "slices"), exist_ok=True)
    train_names = []
    for i in range(n_train_slices):
        name = f"synth_patient_{i:03d}_slice_0"
        image, label = _blob_volume(rng, slice_shape, n_classes)
        with h5py.File(os.path.join(root, "data", "slices",
                                    f"{name}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
        train_names.append(name)
    val_names = []
    for i in range(n_val):
        name = f"synth_val_{i:03d}"
        vol = [_blob_volume(rng, slice_shape, n_classes)
               for _ in range(vol_depth)]
        image = np.stack([v[0] for v in vol])
        label = np.stack([v[1] for v in vol])
        with h5py.File(os.path.join(root, "data", f"{name}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
        val_names.append(name)
    with open(os.path.join(root, "train_slices.list"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    with open(os.path.join(root, "val.list"), "w") as f:
        f.write("\n".join(val_names) + "\n")
    with open(os.path.join(root, "test.list"), "w") as f:
        f.write("\n".join(val_names) + "\n")
    return root


def make_pancreas_dataset(root: str, n_lab: int = 4, n_unlab: int = 6,
                          n_test: int = 2, shape=(48, 48, 48),
                          seed: int = 0) -> str:
    """Pancreas layout: h5 files + train_lab/train_unlab/test .txt lists of
    relative paths."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "h5"), exist_ok=True)
    groups = {"train_lab": n_lab, "train_unlab": n_unlab, "test": n_test}
    for group, count in groups.items():
        rels = []
        for i in range(count):
            rel = os.path.join("h5", f"{group}_{i:03d}.h5")
            image, label = _blob_volume(rng, shape)
            with h5py.File(os.path.join(root, rel), "w") as f:
                f.create_dataset("image", data=image)
                f.create_dataset("label", data=label.astype(np.float32))
            rels.append(rel)
        with open(os.path.join(root, f"{group}.txt"), "w") as f:
            f.write("\n".join(rels) + "\n")
    return root
