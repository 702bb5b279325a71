"""Batch assembly + async device prefetch.

Replaces the reference's torch DataLoader worker processes
(`LA_BCP_train.py:134`) with a background builder thread and a bounded
prefetch queue: while the TPU runs step N, the host assembles and uploads
step N+1 (double buffering across the PCIe/ICI boundary). Batches are
delivered as the split-stream dict the jitted steps consume
(``img_a/img_b/lab_a/lab_b[/uimg_a/uimg_b]``), optionally sharded over a
data-parallel mesh.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import ml_dtypes
import numpy as np

from bcp_tpu.config import Config
from bcp_tpu.data.datasets import PancreasDataset, build_dataset
from bcp_tpu.data.sampler import two_stream_batches


ACDC_PATIENTS_TO_SLICES = {
    # `patients_to_slices` (`ACDC_BCP_train.py:181-191`)
    1: 32, 3: 68, 7: 136, 14: 256, 21: 396, 28: 512, 35: 664, 70: 1312,
}


def labeled_count(cfg: Config, total: int) -> int:
    if cfg.variant == "acdc":
        return ACDC_PATIENTS_TO_SLICES[cfg.labelnum]
    return cfg.labelnum


def _stack(images, labels, img_dtype=np.float32):
    # Compact wire format: bf16 images + uint8 labels halve-to-quarter the
    # host->device bytes (the transfer, not compute, bounds tunneled
    # setups); the jitted step casts labels back to int32 on device.
    img = np.stack(images)[..., None].astype(img_dtype)
    lab = np.stack(labels).astype(np.uint8)
    return img, lab


class BCPBatchFeeder:
    """Infinite iterator of train batches for one stage.

    stage='pre' yields labeled pairs only; stage='self' adds the two
    unlabeled sub-streams. Epoch pacing matches the reference: one epoch =
    one pass over the labeled indices (`dataset.py:296-307`), and for the
    pancreas variant the four zip'd sequential loaders
    (`train_pancreas.py:144`).
    """

    def __init__(self, cfg: Config, stage: str, seed: Optional[int] = None,
                 sharding=None, prefetch: int = 2, data_scale: int = 1,
                 stack: int = 1, store_cache: Optional[dict] = None):
        """``data_scale`` widens every stream by the data-parallel factor
        (global batch = reference batch x mesh size; parallel/mesh.py) —
        epoch pacing shrinks accordingly.

        ``stack=K`` delivers K consecutive iterations' batches as one
        leading-stacked pytree for the K-step fused train program
        (`Config.steps_per_dispatch`): the index streams are consumed in
        the exact K=1 order, so batch content per sub-step is identical —
        only the host/device hand-off is amortised.

        ``store_cache``: optional dict shared across feeders of the same
        run. The device-resident store is a pure function of (variant,
        dataset, patch) — identical for the pre and self stages — and
        uploading it through a tunneled runtime costs minutes, so the
        trainer passes one cache and the second stage reuses the first
        stage's store instead of re-reading + re-uploading it."""
        self.cfg = cfg
        self.stage = stage
        self.sharding = sharding
        self.scale = max(int(data_scale), 1)
        self.stack = max(int(stack), 1)
        self.seed = cfg.seed if seed is None else seed
        self.rng = np.random.default_rng(self.seed)
        self.img_dtype = (ml_dtypes.bfloat16
                          if cfg.compute_dtype == "bfloat16"
                          else np.float32)
        self._store = None
        self._lab_store = None
        self._unlab_store = None
        self._store_cache = store_cache if store_cache is not None else {}
        self.store_init_s = 0.0
        if cfg.device_data_cache and (sharding is not None
                                      or self.scale > 1):
            raise ValueError("device_data_cache is a single-device "
                             "optimisation; use the host feed with a mesh")
        # stacked host batches carry a leading K axis: keep it replicated
        # and shift the batch(/space) spec right (computed once; also
        # fails fast here if sharding isn't a NamedSharding)
        self._stacked_sharding = None
        if self.stack > 1 and sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._stacked_sharding = NamedSharding(
                sharding.mesh, PartitionSpec(None, *sharding.spec))
        if cfg.variant == "pancreas":
            self._init_pancreas()
        else:
            self._init_two_stream()
        if cfg.device_data_cache:
            self._init_device_store()
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # -- index streams ------------------------------------------------
    def _init_two_stream(self):
        cfg = self.cfg
        self.dataset = build_dataset(cfg, "train")
        total = len(self.dataset)
        n_lab = labeled_count(cfg, total)
        labeled = list(range(n_lab))
        unlabeled = list(range(n_lab, total))
        self.steps_per_epoch = max(n_lab // (cfg.labeled_bs * self.scale),
                                   1)
        self._index_stream = two_stream_batches(
            labeled, unlabeled, cfg.batch_size * self.scale,
            cfg.unlabeled_bs * self.scale, seed=self.seed)

    def _init_pancreas(self):
        cfg = self.cfg
        self.lab_a = PancreasDataset(cfg.root_path, "train_lab",
                                     oversample=cfg.labeled_oversample)
        self.lab_b = PancreasDataset(cfg.root_path, "train_lab",
                                     oversample=cfg.labeled_oversample,
                                     reverse=True)
        self.unlab_a = PancreasDataset(cfg.root_path, "train_unlab")
        self.unlab_b = PancreasDataset(cfg.root_path, "train_unlab",
                                       reverse=True)
        per = cfg.labeled_sub_bs * self.scale
        un = cfg.unlabeled_sub_bs * self.scale
        n_lab_batches = len(self.lab_a) // per
        n_unlab_batches = len(self.unlab_a) // un
        if self.stage == "pre":
            self.steps_per_epoch = max(n_lab_batches, 1)
        else:
            self.steps_per_epoch = max(min(n_lab_batches, n_unlab_batches),
                                       1)
        n_raw_lab = len(self.lab_a)
        n_raw_unlab = len(self.unlab_a)

        def stream():
            # sequential, shuffle=False, drop_last=True
            # (`pancreas/dataloaders.py:185-194`); modular wrap keeps the
            # scaled (mesh-widened) streams in range on tiny datasets
            while True:
                for i in range(self.steps_per_epoch):
                    lab_idx = [j % n_raw_lab
                               for j in range(i * per, (i + 1) * per)]
                    unlab_idx = [j % n_raw_unlab
                                 for j in range(i * un, (i + 1) * un)]
                    yield lab_idx, unlab_idx
        self._index_stream = stream()

    # -- device-resident volume store -----------------------------------
    def _init_device_store(self):
        import time

        import jax.numpy as jnp
        from bcp_tpu.data.device_store import (DeviceSliceStore,
                                               DeviceVolumeStore)
        cfg = self.cfg
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        t0 = time.time()

        def get(key, build):
            store = self._store_cache.get(key)
            if store is None:
                store = build()
                self._store_cache[key] = store
            return store

        if cfg.variant == "la":
            self._store = get("store", lambda: (
                DeviceVolumeStore.from_dataset(
                    self.dataset, range(len(self.dataset)), cfg.patch_size,
                    pad_extra=3, img_dtype=dtype)))
        elif cfg.variant == "acdc":
            self._store = get("store", lambda: (
                DeviceSliceStore.from_dataset(
                    self.dataset, range(len(self.dataset)), cfg.patch_size,
                    img_dtype=dtype)))
        elif cfg.variant == "pancreas":
            self._lab_store = get("lab", lambda: (
                DeviceVolumeStore.from_dataset(
                    self.lab_a, range(len(self.lab_a.rel_paths)),
                    cfg.patch_size, pad_extra=1, img_dtype=dtype)))
            # only the self stage reads the unlabeled store; the pre
            # stage must not pay its (tunnel-bound) upload
            if self.stage == "self":
                self._unlab_store = get("unlab", lambda: (
                    DeviceVolumeStore.from_dataset(
                        self.unlab_a, range(len(self.unlab_a.rel_paths)),
                        cfg.patch_size, pad_extra=1, img_dtype=dtype)))
        else:
            raise ValueError("device_data_cache supports la/acdc/pancreas")
        self.store_init_s = time.time() - t0

    def _build_device(self):
        cfg = self.cfg
        lab_idx, unlab_idx = next(self._index_stream)
        if cfg.variant == "la":
            sub = cfg.labeled_sub_bs
            img, lab = self._store.sample_batch(lab_idx, self.rng,
                                                rotflip=True)
            batch = {"img_a": img[:sub], "img_b": img[sub:],
                     "lab_a": lab[:sub], "lab_b": lab[sub:]}
            if self.stage == "self":
                uimg, _ = self._store.sample_batch(unlab_idx, self.rng,
                                                   rotflip=True)
                usub = cfg.unlabeled_sub_bs
                batch["uimg_a"], batch["uimg_b"] = uimg[:usub], uimg[usub:]
            return batch
        if cfg.variant == "acdc":
            # mirror the host _build exactly: all labeled samples consume
            # the RNG first (in lab_idx order), then the unlabeled ones
            sub = cfg.labeled_sub_bs
            img, lab = self._store.sample_batch(lab_idx, self.rng)
            batch = {"img_a": img[:sub], "img_b": img[sub:],
                     "lab_a": lab[:sub], "lab_b": lab[sub:]}
            if self.stage == "self":
                usub = cfg.unlabeled_sub_bs
                uimg, ulab = self._store.sample_batch(unlab_idx, self.rng)
                batch["uimg_a"], batch["uimg_b"] = uimg[:usub], uimg[usub:]
                # ACDC's "unlabeled" slices carry true labels; snapshot
                # panels mix them (`ACDC_BCP_train.py:368-369,404,413`)
                batch["ulab_a"], batch["ulab_b"] = ulab[:usub], ulab[usub:]
            return batch
        # pancreas: map oversampled/reversed stream indices to raw volumes
        n = len(self.lab_a.rel_paths)
        raw_a = [i % n for i in lab_idx]
        raw_b = [n - (i % n) - 1 for i in lab_idx]
        img_a, lab_a = self._lab_store.sample_batch(raw_a, self.rng,
                                                    rotflip=False)
        img_b, lab_b = self._lab_store.sample_batch(raw_b, self.rng,
                                                    rotflip=False)
        batch = {"img_a": img_a, "img_b": img_b,
                 "lab_a": lab_a, "lab_b": lab_b}
        if self.stage == "self":
            nu = len(self.unlab_a.rel_paths)
            u_a = [i % nu for i in unlab_idx]
            u_b = [nu - (i % nu) - 1 for i in unlab_idx]
            batch["uimg_a"] = self._unlab_store.center_batch(u_a)[0]
            batch["uimg_b"] = self._unlab_store.center_batch(u_b)[0]
        return batch

    # -- batch assembly -------------------------------------------------
    def _build(self) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        lab_idx, unlab_idx = next(self._index_stream)
        if cfg.variant == "pancreas":
            imgs_a, labs_a = zip(*[self.lab_a.sample_train(
                i, cfg.patch_size, self.rng) for i in lab_idx])
            imgs_b, labs_b = zip(*[self.lab_b.sample_train(
                i, cfg.patch_size, self.rng) for i in lab_idx])
        else:
            sub = cfg.labeled_sub_bs * self.scale
            samples = [self.dataset.sample_train(i, cfg.patch_size, self.rng)
                       for i in lab_idx]
            imgs_a, labs_a = zip(*samples[:sub])
            imgs_b, labs_b = zip(*samples[sub:])
        img_a, lab_a = _stack(imgs_a, labs_a, self.img_dtype)
        img_b, lab_b = _stack(imgs_b, labs_b, self.img_dtype)
        batch = {"img_a": img_a, "img_b": img_b,
                 "lab_a": lab_a, "lab_b": lab_b}
        if self.stage == "self":
            if cfg.variant == "pancreas":
                uim_a, _ = zip(*[self.unlab_a.sample_train(
                    i, cfg.patch_size, self.rng) for i in unlab_idx])
                uim_b, _ = zip(*[self.unlab_b.sample_train(
                    i, cfg.patch_size, self.rng) for i in unlab_idx])
            else:
                usub = cfg.unlabeled_sub_bs * self.scale
                usamples = [self.dataset.sample_train(
                    i, cfg.patch_size, self.rng) for i in unlab_idx]
                uim_a = [s[0] for s in usamples[:usub]]
                uim_b = [s[0] for s in usamples[usub:]]
                if cfg.variant == "acdc":
                    # ACDC's "unlabeled" slices all carry labels; the
                    # snapshot panels mix the TRUE labels
                    # (`ACDC_BCP_train.py:368-369,404,413`). Side-channel
                    # keys: the trainer pops them before step dispatch.
                    batch["ulab_a"] = np.stack(
                        [s[1] for s in usamples[:usub]]).astype(np.uint8)
                    batch["ulab_b"] = np.stack(
                        [s[1] for s in usamples[usub:]]).astype(np.uint8)
            batch["uimg_a"] = np.stack(uim_a)[..., None].astype(
                self.img_dtype)
            batch["uimg_b"] = np.stack(uim_b)[..., None].astype(
                self.img_dtype)
        return batch

    def _build_device_stacked(self):
        """K iterations' crops in two device programs + one split/reshape
        (vs 2K + K dispatches for K separate builds): concatenate the K
        index draws (same stream order as K sequential ``_build_device``
        calls, so per-sub-step content is identical), crop once, reshape
        (K*n, ...) -> (K, n, ...) and split the streams in one jitted fn.
        """
        cfg, K = self.cfg, self.stack
        if cfg.variant == "acdc":
            return self._build_device_stacked_acdc()
        if cfg.variant == "pancreas":
            return self._build_device_stacked_pancreas()
        # Host RNG draws interleave labeled/unlabeled PER SUB-STEP,
        # exactly like K sequential _build_device calls, so the batch
        # content per sub-step is identical to the K=1 run of the same
        # seed; only the device crops are fused into two programs.
        lab_params, unlab_params = [], []
        for _ in range(K):
            li, ui = next(self._index_stream)
            lab_params.append(self._store.draw_params(li, self.rng,
                                                      rotflip=True))
            if self.stage == "self":
                unlab_params.append(self._store.draw_params(
                    ui, self.rng, rotflip=True))

        def _cat(plist):
            return tuple(np.concatenate([p[i] for p in plist])
                         for i in range(4))

        img, lab = self._store.crop_batch(_cat(lab_params), rotflip=True)
        uimg = None
        if self.stage == "self":
            uimg, _ = self._store.crop_batch(_cat(unlab_params),
                                             rotflip=True)
        if not hasattr(self, "_split_fn"):
            sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs

            @jax.jit
            def split(img, lab, uimg):
                n = img.shape[0] // K
                img = img.reshape(K, n, *img.shape[1:])
                lab = lab.reshape(K, n, *lab.shape[1:])
                out = {"img_a": img[:, :sub], "img_b": img[:, sub:],
                       "lab_a": lab[:, :sub], "lab_b": lab[:, sub:]}
                if uimg is not None:
                    nu = uimg.shape[0] // K
                    u = uimg.reshape(K, nu, *uimg.shape[1:])
                    out["uimg_a"] = u[:, :usub]
                    out["uimg_b"] = u[:, usub:]
                return out
            self._split_fn = split
        return self._split_fn(img, lab, uimg)

    def _build_device_stacked_acdc(self):
        """K-stacked ACDC device batches: one augmentation program for
        the K labeled draws and one for the K unlabeled draws. RNG draws
        per sub-step (all labeled, then all unlabeled) match K sequential
        ``_build_device`` calls exactly, so batch content per sub-step is
        identical to the K=1 run of the same seed."""
        cfg, K = self.cfg, self.stack
        lab_p, unlab_p = [], []
        for _ in range(K):
            li, ui = next(self._index_stream)
            lab_p.append(self._store.draw_params(li, self.rng))
            if self.stage == "self":
                unlab_p.append(self._store.draw_params(ui, self.rng))

        def _cat(plist):
            return tuple(np.concatenate([p[i] for p in plist])
                         for i in range(len(plist[0])))

        img, lab = self._store.aug_batch(_cat(lab_p))
        uimg = ulab = None
        if self.stage == "self":
            uimg, ulab = self._store.aug_batch(_cat(unlab_p))
        if not hasattr(self, "_split_fn_acdc"):
            sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs

            @jax.jit
            def split(img, lab, uimg, ulab):
                n = img.shape[0] // K
                img = img.reshape(K, n, *img.shape[1:])
                lab = lab.reshape(K, n, *lab.shape[1:])
                out = {"img_a": img[:, :sub], "img_b": img[:, sub:],
                       "lab_a": lab[:, :sub], "lab_b": lab[:, sub:]}
                if uimg is not None:
                    nu = uimg.shape[0] // K
                    u = uimg.reshape(K, nu, *uimg.shape[1:])
                    ul = ulab.reshape(K, nu, *ulab.shape[1:])
                    out["uimg_a"], out["uimg_b"] = u[:, :usub], u[:, usub:]
                    # true labels ride along for the snapshot panels only
                    out["ulab_a"], out["ulab_b"] = (ul[:, :usub],
                                                    ul[:, usub:])
                return out
            self._split_fn_acdc = split
        return self._split_fn_acdc(img, lab, uimg, ulab)

    def _build_device_stacked_pancreas(self):
        """K-stacked pancreas device batches: the a/b labeled streams'
        K draws fuse into one crop program each; the unlabeled center
        crops (RNG-free) fuse likewise. Per-sub-step RNG order (a-stream
        draws then b-stream draws) matches K sequential ``_build_device``
        calls."""
        cfg, K = self.cfg, self.stack
        n = len(self.lab_a.rel_paths)
        a_p, b_p = [], []
        u_a_idx, u_b_idx = [], []
        for _ in range(K):
            li, ui = next(self._index_stream)
            raw_a = [i % n for i in li]
            raw_b = [n - (i % n) - 1 for i in li]
            a_p.append(self._lab_store.draw_params(raw_a, self.rng,
                                                   rotflip=False))
            b_p.append(self._lab_store.draw_params(raw_b, self.rng,
                                                   rotflip=False))
            if self.stage == "self":
                nu = len(self.unlab_a.rel_paths)
                u_a_idx.extend(i % nu for i in ui)
                u_b_idx.extend(nu - (i % nu) - 1 for i in ui)

        def _cat(plist):
            return tuple(np.concatenate([p[i] for p in plist])
                         for i in range(len(plist[0])))

        img_a, lab_a = self._lab_store.crop_batch(_cat(a_p),
                                                  rotflip=False)
        img_b, lab_b = self._lab_store.crop_batch(_cat(b_p),
                                                  rotflip=False)
        uimg_a = uimg_b = None
        if self.stage == "self":
            uimg_a = self._unlab_store.center_batch(u_a_idx)[0]
            uimg_b = self._unlab_store.center_batch(u_b_idx)[0]
        if not hasattr(self, "_split_fn_pancreas"):
            @jax.jit
            def split(img_a, lab_a, img_b, lab_b, uimg_a, uimg_b):
                def r(x):
                    return x.reshape(K, x.shape[0] // K, *x.shape[1:])
                out = {"img_a": r(img_a), "img_b": r(img_b),
                       "lab_a": r(lab_a), "lab_b": r(lab_b)}
                if uimg_a is not None:
                    out["uimg_a"] = r(uimg_a)
                    out["uimg_b"] = r(uimg_b)
                return out
            self._split_fn_pancreas = split
        return self._split_fn_pancreas(img_a, lab_a, img_b, lab_b,
                                       uimg_a, uimg_b)

    def _worker(self):
        try:
            while not self._stop.is_set():
                if self.cfg.device_data_cache:
                    device_batch = (self._build_device_stacked()
                                    if self.stack > 1
                                    else self._build_device())
                elif self.stack > 1:
                    hbs = [self._build() for _ in range(self.stack)]
                    host_batch = {k: np.stack([b[k] for b in hbs])
                                  for k in hbs[0]}
                    device_batch = jax.device_put(host_batch,
                                                  self._stacked_sharding)
                else:
                    host_batch = self._build()
                    device_batch = jax.device_put(host_batch,
                                                  self.sharding)
                self._queue.put(device_batch)
        except Exception as e:  # surface in the consumer
            self._queue.put(e)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        return self

    def __next__(self) -> Dict[str, jax.Array]:
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
