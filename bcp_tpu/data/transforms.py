"""Host-side numpy augmentations.

Reproduces the reference transform semantics (`dataloaders/dataset.py:
52-277`, `pancreas/dataloaders.py:22-101`) as pure functions over an
explicit ``np.random.Generator`` — no global RNG state, so the pipeline is
reproducible and per-worker seedable. Augmentation stays on the host (cheap
integer/index work); the TPU only ever sees fixed-shape crops.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from scipy import ndimage


def random_rot_flip(image: np.ndarray, label: np.ndarray,
                    rng: np.random.Generator):
    """k*90-degree rotation in the leading two axes + flip along axis 0/1 —
    `dataloaders/dataset.py:52-59` (used for both 2D ACDC slices and 3D LA
    volumes; 3D volumes rotate about the z axis)."""
    k = int(rng.integers(0, 4))
    image = np.rot90(image, k)
    label = np.rot90(label, k)
    axis = int(rng.integers(0, 2))
    image = np.flip(image, axis=axis).copy()
    label = np.flip(label, axis=axis).copy()
    return image, label


def random_rotate(image: np.ndarray, label: np.ndarray,
                  rng: np.random.Generator):
    """Nearest-neighbour rotation by a uniform angle in [-20, 20) degrees —
    `dataloaders/dataset.py:62-66`."""
    angle = int(rng.integers(-20, 20))
    image = ndimage.rotate(image, angle, order=0, reshape=False)
    label = ndimage.rotate(label, angle, order=0, reshape=False)
    return image, label


def zoom_to(image: np.ndarray, label: np.ndarray,
            output_size: Sequence[int]):
    """Nearest-neighbour zoom to a fixed 2D size —
    `RandomGenerator.__call__` (`dataloaders/dataset.py:82-84`)."""
    x, y = image.shape
    sx, sy = output_size[0] / x, output_size[1] / y
    image = ndimage.zoom(image, (sx, sy), order=0)
    label = ndimage.zoom(label, (sx, sy), order=0)
    return image, label


def acdc_random_generator(image: np.ndarray, label: np.ndarray,
                          output_size: Sequence[int],
                          rng: np.random.Generator):
    """The full ACDC train transform (`dataloaders/dataset.py:69-88`):
    p=0.5 rot/flip, else p=0.25 rotate (two independent coin flips, exactly
    like the reference's `if random()>0.5 ... elif random()>0.5`), then
    nearest zoom to 256^2."""
    if rng.random() > 0.5:
        image, label = random_rot_flip(image, label, rng)
    elif rng.random() > 0.5:
        image, label = random_rotate(image, label, rng)
    image, label = zoom_to(image, label, output_size)
    return image.astype(np.float32), label.astype(np.uint8)


def _pad_to_fit(arrs, output_size, extra: int):
    """Shared pad-if-small logic; `extra` is +3 for LA
    (`dataset.py:155-159`) and +1 for pancreas (`pancreas/dataloaders.py:
    35-38`)."""
    shape = arrs[0].shape
    if all(s > o for s, o in zip(shape, output_size)):
        return arrs
    pads = [max((o - s) // 2 + extra, 0) for s, o in zip(shape, output_size)]
    pad_width = [(p, p) for p in pads]
    return [np.pad(a, pad_width, mode="constant", constant_values=0)
            for a in arrs]


def random_crop(image: np.ndarray, label: np.ndarray,
                output_size: Sequence[int], rng: np.random.Generator,
                pad_extra: int = 3):
    """Pad-then-random-crop — `RandomCrop` (`dataloaders/dataset.py:
    173-212`; pancreas flavour `pancreas/dataloaders.py:22-60` uses
    pad_extra=1)."""
    image, label = _pad_to_fit([image, label], output_size, pad_extra)
    starts = [int(rng.integers(0, s - o))
              for s, o in zip(image.shape, output_size)]
    sl = tuple(slice(st, st + o) for st, o in zip(starts, output_size))
    return image[sl], label[sl]


def center_crop(image: np.ndarray, label: np.ndarray,
                output_size: Sequence[int], pad_extra: int = 3):
    """`CenterCrop` (`dataloaders/dataset.py:145-170`; pancreas flavour
    pad_extra=1)."""
    image, label = _pad_to_fit([image, label], output_size, pad_extra)
    starts = [int(round((s - o) / 2.0))
              for s, o in zip(image.shape, output_size)]
    sl = tuple(slice(st, st + o) for st, o in zip(starts, output_size))
    return image[sl], label[sl]


def random_noise(image: np.ndarray, rng: np.random.Generator,
                 mu: float = 0.0, sigma: float = 0.1):
    """Clipped gaussian noise — `RandomNoise` (`dataset.py:242-252`)."""
    noise = np.clip(sigma * rng.standard_normal(image.shape),
                    -2 * sigma, 2 * sigma) + mu
    return image + noise


def la_train_transform(image, label, patch_size, rng):
    """LA train pipeline: RandomRotFlip -> RandomCrop
    (`LA_BCP_train.py:122-126`)."""
    image, label = random_rot_flip(image, label, rng)
    image, label = random_crop(image, label, patch_size, rng)
    return image.astype(np.float32), label.astype(np.int32)


def pancreas_train_transform(image, label, patch_size, rng):
    """Pancreas train pipeline: RandomCrop only
    (`pancreas/dataloaders.py:120-125`)."""
    image, label = random_crop(image, label, patch_size, rng, pad_extra=1)
    return image.astype(np.float32), label.astype(np.int32)


def pancreas_test_transform(image, label, patch_size):
    """Pancreas unlabeled/test pipeline: CenterCrop
    (`pancreas/dataloaders.py:127-136`)."""
    image, label = center_crop(image, label, patch_size, pad_extra=1)
    return image.astype(np.float32), label.astype(np.int32)
