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


class DeviceSliceStore:
    """ACDC train slices resident in HBM, augmented on device.

    Reproduces the reference's ``RandomGenerator``
    (`dataloaders/dataset.py:69-88`): p=0.5 rot90+flip, elif p=0.25
    nearest rotate by an integer angle in [-20, 20), then nearest zoom to
    256x256 — as fixed-shape gathers over bucket-padded native slices, so
    per-step host->device traffic is a handful of int32 params per sample
    instead of the ~6 MB batch the host feed uploads (which, under the
    tunneled runtime, is also the path that leaks host transfer buffers —
    see docs/DESIGN.md "Host transfer-buffer leak").

    Exactness vs the host/scipy path (`transforms.acdc_random_generator`):

    - none / rot90+flip modes and the final zoom are bit-exact: scipy's
      ``zoom(order=0)`` maps output index i to input index
      ``floor(i*(n_in-1)/(n_out-1) + 0.5)``, which this kernel evaluates
      in exact int32 arithmetic as ``(2*i*(n_in-1) + n_out-1) //
      (2*(n_out-1))`` (the exact rational is never ON a rounding
      boundary: its numerator is odd while the denominator is even, so
      scipy's f64 evaluation and the integer form always agree), and
      rot90/flip are pure index permutations composed into the gather.
    - the rotate mode resamples with scipy's exact conventions (source
      coordinate ``R^-1 @ (out - out_center) + in_center``, nearest =
      ``floor(c + 0.5)``, cval=0 outside the [0, n-1] coordinate box) but
      computes the coordinates in f32 on device where scipy uses f64;
      pixels whose source coordinate lies within ~2e-5 of a rounding
      boundary can pick the adjacent source pixel. Measured mismatch is
      O(1e-5) of pixels (tests pin < 1e-3); scipy itself varies at these
      boundaries across versions.

    Kernel shape (performance): all three modes reduce to ONE composed
    per-pixel gather at the 256x256 output resolution. The rotate mode's
    coordinate map is evaluated at the zoom's (integer) source indices —
    ``out[i,j] = img[rot_map(zoom_i(i), zoom_j(j))]`` — which is
    bit-identical to rotating the full native frame and then zooming
    (the zoom only ever *reads* rotated pixels at those same integer
    indices, and the coordinate arithmetic sees identical f32 inputs).
    This halves the gathered element count vs a materialised rotate +
    zoom pipeline and skips the intermediate (hmax, wmax) buffers.
    Nearest-neighbour augmentation only moves values — it never
    interpolates — so gathering from a ``img_dtype`` (bf16) store and
    casting nothing afterwards is bit-identical to gathering f32 and
    casting at the end; the store therefore holds ``img_dtype`` pixels
    and the gather moves half the bytes.
    """

    def __init__(self, images, labels, out_size=(256, 256),
                 img_dtype=jnp.bfloat16):
        out_size = tuple(int(s) for s in out_size)
        assert len(out_size) == 2 and min(out_size) > 1
        shapes = np.array([img.shape for img in images], np.int32)
        hmax = int(shapes[:, 0].max())
        wmax = int(shapes[:, 1].max())
        imgs = np.zeros((len(images), hmax, wmax), np.float32)
        labs = np.zeros((len(images), hmax, wmax), np.uint8)
        for i, (img, lab) in enumerate(zip(images, labels)):
            h, w = img.shape
            imgs[i, :h, :w] = img
            labs[i, :h, :w] = lab
        self.out_size = out_size
        self.shapes = shapes
        self.img_dtype = img_dtype
        # nearest-neighbour augmentation passes values through untouched,
        # so casting to the wire dtype at upload is bit-identical to the
        # host feed's post-transform cast — and the gather moves half the
        # bytes (see class docstring)
        self.images = jax.device_put(
            imgs.astype(np.dtype(img_dtype) if img_dtype is not None
                        else np.float32))
        self.labels = jax.device_put(labs)
        self._aug_fn = self._build_aug_fn(hmax, wmax)

    @classmethod
    def from_dataset(cls, dataset, indices, out_size=(256, 256),
                     img_dtype=jnp.bfloat16):
        pairs = [dataset.load(i) for i in indices]
        return cls([np.asarray(p[0], np.float32) for p in pairs],
                   [np.asarray(p[1], np.uint8) for p in pairs],
                   out_size, img_dtype)

    # ------------------------------------------------------------------
    def _build_aug_fn(self, hmax, wmax):
        oh, ow = self.out_size

        def zoom_idx(n_in, n_out):
            # floor(i*(n_in-1)/(n_out-1) + 0.5) in exact int32 arithmetic
            i = jnp.arange(n_out, dtype=jnp.int32)
            return (2 * i * (n_in - 1) + (n_out - 1)) // (2 * (n_out - 1))

        def source_map(h, w, mode, k, flip, angle):
            """Composed per-pixel source indices (ri, rj) + inside mask
            at output resolution: exact zoom -> inverse flip -> inverse
            rot90 -> (mode 2) nearest rotate, all in index space."""
            hf = h.astype(jnp.float32)
            wf = w.astype(jnp.float32)
            # --- exact zoom indices in the post-rot90 frame ------------
            rotflip = mode == 1
            swap = rotflip & (k % 2 == 1)
            h2 = jnp.where(swap, w, h)
            w2 = jnp.where(swap, h, w)
            zi = jnp.broadcast_to(zoom_idx(h2, oh)[:, None], (oh, ow))
            zj = jnp.broadcast_to(zoom_idx(w2, ow)[None, :], (oh, ow))
            # invert the flip (applied after rot90, in the rotated frame)
            fi = jnp.where(rotflip & (flip == 0), h2 - 1 - zi, zi)
            fj = jnp.where(rotflip & (flip == 1), w2 - 1 - zj, zj)
            # invert rot90(k): rotated[i,j] = orig[...]
            k_eff = jnp.where(rotflip, k, 0)
            si = jnp.select(
                [k_eff == 0, k_eff == 1, k_eff == 2, k_eff == 3],
                [fi, fj, h - 1 - fi, h - 1 - fj])
            sj = jnp.select(
                [k_eff == 0, k_eff == 1, k_eff == 2, k_eff == 3],
                [fj, w - 1 - fi, w - 1 - fj, fi])
            # --- mode 2: nearest rotate, evaluated AT the zoom indices -
            # `ndimage.rotate(x, a, reshape=False, order=0)`:
            # out(i,j) <- in(R @ (o - c) + c), c = ((h-1)/2, (w-1)/2),
            # R = [[cos,sin],[-sin,cos]]. (si, sj) are exact integers, so
            # the f32 coordinate arithmetic is bit-identical to running
            # it on the full native grid and then gathering.
            a = angle.astype(jnp.float32) * (np.pi / 180.0)
            c, s = jnp.cos(a), jnp.sin(a)
            ci0, cj0 = (hf - 1) / 2, (wf - 1) / 2
            sif = si.astype(jnp.float32)
            sjf = sj.astype(jnp.float32)
            src_i = c * (sif - ci0) + s * (sjf - cj0) + ci0
            src_j = -s * (sif - ci0) + c * (sjf - cj0) + cj0
            inside = ((src_i >= 0) & (src_i <= hf - 1)
                      & (src_j >= 0) & (src_j <= wf - 1))
            ri = jnp.clip(jnp.floor(src_i + 0.5).astype(jnp.int32),
                          0, hmax - 1)
            rj = jnp.clip(jnp.floor(src_j + 0.5).astype(jnp.int32),
                          0, wmax - 1)
            rot = mode == 2
            return (jnp.where(rot, ri, si), jnp.where(rot, rj, sj),
                    jnp.where(rot, inside, True))

        def one(img, lab, h, w, mode, k, flip, angle):
            ri, rj, inside = source_map(h, w, mode, k, flip, angle)
            img_out = jnp.where(inside, img[ri, rj],
                                jnp.zeros((), img.dtype))
            lab_out = jnp.where(inside, lab[ri, rj], 0)
            return img_out, lab_out

        @jax.jit
        def aug_batch(images, labels, idx, hs, ws, modes, ks, flips,
                      angles):
            img, lab = jax.vmap(one)(images[idx], labels[idx], hs, ws,
                                     modes, ks, flips, angles)
            return img[..., None], lab

        return aug_batch

    # ------------------------------------------------------------------
    def draw_params(self, indices, rng: np.random.Generator):
        """Host RNG draws for one batch in the reference's exact
        per-sample order (`dataloaders/dataset.py:69-79` /
        `transforms.acdc_random_generator`): coin > 0.5 -> rot90 k ~
        U{0..3} + flip axis ~ U{0,1}; elif coin > 0.5 -> angle ~
        U{-20..19}. Same draws as the host feed under the same seed, so
        batch content matches the host path sample-for-sample."""
        idx = np.asarray(indices, np.int32)
        n = len(idx)
        modes = np.zeros(n, np.int32)
        ks = np.zeros(n, np.int32)
        flips = np.zeros(n, np.int32)
        angles = np.zeros(n, np.int32)
        for j in range(n):
            if rng.random() > 0.5:
                modes[j] = 1
                ks[j] = rng.integers(0, 4)
                flips[j] = rng.integers(0, 2)
            elif rng.random() > 0.5:
                modes[j] = 2
                angles[j] = rng.integers(-20, 20)
        return idx, modes, ks, flips, angles

    def aug_batch(self, params):
        """Apply :meth:`draw_params` output on device -> (img, lab)."""
        idx, modes, ks, flips, angles = params
        hs = jnp.asarray(self.shapes[idx, 0])
        ws = jnp.asarray(self.shapes[idx, 1])
        return self._aug_fn(self.images, self.labels, jnp.asarray(idx),
                            hs, ws, jnp.asarray(modes), jnp.asarray(ks),
                            jnp.asarray(flips), jnp.asarray(angles))

    def sample_batch(self, indices, rng: np.random.Generator):
        """RandomGenerator-augmented batch, fully on device."""
        return self.aug_batch(self.draw_params(indices, rng))
