"""Device-resident training volumes: upload once, augment on device.

The reference (and the default host feed here) re-uploads every crop batch
each step. For the LA/pancreas pipelines the whole training set fits in a
corner of HBM (~2-3GB at bf16), so this store uploads each padded volume
once and produces augmented crop batches entirely on device — per-step
host->device traffic drops to a handful of index/offset scalars.

Augmentation equivalence with the host transforms (`dataloaders/
dataset.py:52-59,173-212`): the reference rotates/flips the whole volume,
then crops uniformly over the rotated extent. Because the xy patch is
square, that is distributionally identical to cropping in original
coordinates (uniform offsets are preserved under the rot90 bijection) and
rotating/flipping the crop — which is what the device kernel does:

    crop = dynamic_slice(volume, offsets, patch)
    crop = switch(k, [rot90^0..rot90^3 over xy])
    crop = switch(flip, [flip_x, flip_y])

Pad-if-small is applied once at upload with the reference's
``(patch-dim)//2 + pad_extra`` margins, so offset ranges match exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _pad_like_reference(image, label, patch, pad_extra):
    """`RandomCrop` pad-if-small (`dataset.py:190-196`; pancreas
    pad_extra=1, `pancreas/dataloaders.py:34-38`)."""
    shape = image.shape
    if all(s > p for s, p in zip(shape, patch)):
        return image, label
    pads = [(max((p - s) // 2 + pad_extra, 0),) * 2
            for s, p in zip(shape, patch)]
    return (np.pad(image, pads, mode="constant"),
            np.pad(label, pads, mode="constant"))


class DeviceVolumeStore:
    """Stacked, bucket-padded volumes resident in HBM."""

    def __init__(self, images: Sequence[np.ndarray],
                 labels: Sequence[np.ndarray], patch: Sequence[int],
                 pad_extra: int = 3, img_dtype=jnp.bfloat16):
        patch = tuple(patch)
        padded = []
        for img, lab in zip(images, labels):
            padded.append(_pad_like_reference(
                np.asarray(img, np.float32), np.asarray(lab), patch,
                pad_extra))
        shapes = np.array([p[0].shape for p in padded], np.int32)
        # square xy bucket so rot90 of the crop stays shape-stable
        bx = int(max(shapes[:, 0].max(), shapes[:, 1].max()))
        bucket = (bx, bx, int(shapes[:, 2].max()))
        imgs = np.zeros((len(padded), *bucket), np.float32)
        labs = np.zeros((len(padded), *bucket), np.uint8)
        for i, (img, lab) in enumerate(padded):
            sl = tuple(slice(0, s) for s in img.shape)
            imgs[i][sl] = img
            labs[i][sl] = lab
        self.patch = patch
        self.shapes = shapes                      # valid extents per volume
        self.images = jax.device_put(imgs.astype(
            np.dtype(img_dtype) if img_dtype is not None else np.float32))
        self.labels = jax.device_put(labs)
        self._crop_fn = self._build_crop_fn()

    @classmethod
    def from_dataset(cls, dataset, indices, patch, pad_extra=3,
                     img_dtype=jnp.bfloat16):
        pairs = [dataset.load(i) for i in indices]
        return cls([p[0] for p in pairs], [p[1] for p in pairs], patch,
                   pad_extra, img_dtype)

    # ------------------------------------------------------------------
    def _build_crop_fn(self):
        patch = self.patch

        def one(volume, label, offset, k, flip_axis, do_rotflip):
            img = jax.lax.dynamic_slice(
                volume, (offset[0], offset[1], offset[2]), patch)
            lab = jax.lax.dynamic_slice(
                label, (offset[0], offset[1], offset[2]), patch)

            def rot(n):
                return (lambda a: jnp.rot90(a, n, axes=(0, 1)))
            img_r = jax.lax.switch(k, [rot(n) for n in range(4)], img)
            lab_r = jax.lax.switch(k, [rot(n) for n in range(4)], lab)
            img_f = jax.lax.switch(flip_axis, [
                lambda a: jnp.flip(a, 0), lambda a: jnp.flip(a, 1)], img_r)
            lab_f = jax.lax.switch(flip_axis, [
                lambda a: jnp.flip(a, 0), lambda a: jnp.flip(a, 1)], lab_r)
            img_out = jnp.where(do_rotflip, img_f, img)
            lab_out = jnp.where(do_rotflip, lab_f, lab)
            return img_out, lab_out

        @jax.jit
        def crop_batch(images, labels, idx, offsets, ks, flips, do_rotflip):
            vols = images[idx]
            labs = labels[idx]
            img, lab = jax.vmap(one)(vols, labs, offsets, ks, flips,
                                     do_rotflip)
            return img[..., None], lab

        return crop_batch

    # ------------------------------------------------------------------
    def draw_params(self, indices, rng: np.random.Generator,
                    rotflip: bool = True):
        """Host-side augmentation draws for one batch, matching the
        reference's RNG pattern per sample: k ~ U{0..3}, flip axis ~
        U{0,1} (`dataset.py:52-59`), crop offset ~ U[0, dim-patch)
        (`dataset.py:202-204`). Split from :meth:`crop_batch` so callers
        that fuse several batches into one device program (the K-stacked
        feed) can still consume the RNG stream in the exact per-batch
        order of K sequential ``sample_batch`` calls."""
        idx = np.asarray(indices, np.int32)
        n = len(idx)
        ks = np.zeros(n, np.int32)
        flips = np.zeros(n, np.int32)
        offsets = np.zeros((n, 3), np.int32)
        for j, i in enumerate(idx):
            if rotflip:
                ks[j] = rng.integers(0, 4)
                flips[j] = rng.integers(0, 2)
            shape = self.shapes[i]
            for d in range(3):
                offsets[j, d] = rng.integers(
                    0, max(shape[d] - self.patch[d], 1))
        return idx, offsets, ks, flips

    def crop_batch(self, params, rotflip: bool = True):
        """Apply :meth:`draw_params` output on device."""
        idx, offsets, ks, flips = params
        do = np.full(len(idx), bool(rotflip))
        return self._crop_fn(self.images, self.labels, jnp.asarray(idx),
                             jnp.asarray(offsets), jnp.asarray(ks),
                             jnp.asarray(flips), jnp.asarray(do))

    def sample_batch(self, indices, rng: np.random.Generator,
                     rotflip: bool = True):
        """Random-crop (+ optional rot/flip) batch, fully on device."""
        return self.crop_batch(self.draw_params(indices, rng, rotflip),
                               rotflip)

    def center_batch(self, indices):
        """CenterCrop batch (pancreas unlabeled stream,
        `pancreas/dataloaders.py:63-91`)."""
        idx = np.asarray(indices, np.int32)
        offsets = np.zeros((len(idx), 3), np.int32)
        for j, i in enumerate(idx):
            shape = self.shapes[i]
            for d in range(3):
                offsets[j, d] = int(round(
                    (int(shape[d]) - self.patch[d]) / 2.0))
        n = len(idx)
        zeros = np.zeros(n, np.int32)
        return self._crop_fn(self.images, self.labels, jnp.asarray(idx),
                             jnp.asarray(offsets), jnp.asarray(zeros),
                             jnp.asarray(zeros),
                             jnp.asarray(np.zeros(n, bool)))
