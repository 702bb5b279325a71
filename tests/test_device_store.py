"""Device-resident volume store: crop/rot/flip equivalence with the host
transforms, and the feeder integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.config import la_config, pancreas_config
from bcp_tpu.data import synthetic
from bcp_tpu.data.device_store import DeviceVolumeStore
from bcp_tpu.data.feed import BCPBatchFeeder


def _volumes(n=3, shape=(30, 28, 20), seed=0):
    rng = np.random.default_rng(seed)
    imgs = [rng.normal(size=shape).astype(np.float32) for _ in range(n)]
    labs = [(rng.random(shape) > 0.7).astype(np.uint8) for _ in range(n)]
    return imgs, labs


def test_center_batch_matches_host_center_crop():
    from bcp_tpu.data.transforms import center_crop
    imgs, labs = _volumes()
    patch = (16, 16, 16)
    store = DeviceVolumeStore(imgs, labs, patch, pad_extra=1,
                              img_dtype=jnp.float32)
    got_img, got_lab = store.center_batch([0, 1, 2])
    for i in range(3):
        want_img, want_lab = center_crop(imgs[i], labs[i], patch,
                                         pad_extra=1)
        np.testing.assert_allclose(np.asarray(got_img[i, ..., 0]),
                                   want_img, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_lab[i]), want_lab)


def test_sample_batch_no_rotflip_is_a_crop():
    imgs, labs = _volumes()
    patch = (16, 16, 16)
    store = DeviceVolumeStore(imgs, labs, patch, pad_extra=1,
                              img_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img, lab = store.sample_batch([1], rng, rotflip=False)
    crop = np.asarray(img[0, ..., 0])
    # must appear verbatim somewhere inside the source volume
    src = imgs[1]
    corner = crop[0, 0, 0]
    found = False
    for ox, oy, oz in zip(*np.where(np.isclose(src, corner))):
        if (ox + 16 <= src.shape[0] and oy + 16 <= src.shape[1]
                and oz + 16 <= src.shape[2]):
            if np.allclose(src[ox:ox+16, oy:oy+16, oz:oz+16], crop):
                found = True
                break
    assert found


def test_sample_batch_rotflip_preserves_content():
    imgs, labs = _volumes(shape=(20, 20, 16))
    patch = (12, 12, 8)
    store = DeviceVolumeStore(imgs, labs, patch, pad_extra=1,
                              img_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    img, lab = store.sample_batch([0, 1], rng, rotflip=True)
    assert img.shape == (2, 12, 12, 8, 1)
    assert lab.shape == (2, 12, 12, 8)
    # rot/flip are permutations: all values must come from the volume
    vals = np.asarray(img[0, ..., 0]).ravel()
    pool = set(np.round(imgs[0].ravel(), 5))
    assert all(np.round(v, 5) in pool for v in vals[:50])


def test_pad_if_small():
    imgs, labs = _volumes(shape=(10, 10, 6))
    store = DeviceVolumeStore(imgs, labs, (16, 16, 16), pad_extra=3,
                              img_dtype=jnp.float32)
    img, lab = store.center_batch([0])
    assert img.shape == (1, 16, 16, 16, 1)


def test_la_feeder_device_cache(tmp_path_factory):
    root = synthetic.make_la_dataset(
        str(tmp_path_factory.mktemp("la_dev")), n_train=6, n_test=2,
        shape=(40, 40, 32))
    cfg = la_config(labelnum=4).replace(
        root_path=root, patch_size=(32, 32, 16), batch_size=6,
        labeled_bs=4, max_samples=6, device_data_cache=True,
        compute_dtype="float32")
    feeder = BCPBatchFeeder(cfg, stage="self")
    batch = next(feeder)
    assert batch["img_a"].shape == (2, 32, 32, 16, 1)
    assert batch["uimg_a"].shape == (1, 32, 32, 16, 1)
    assert isinstance(batch["img_a"], jax.Array)
    feeder.close()


def test_pancreas_feeder_device_cache(tmp_path_factory):
    root = synthetic.make_pancreas_dataset(
        str(tmp_path_factory.mktemp("panc_dev")), shape=(40, 40, 40))
    cfg = pancreas_config().replace(
        root_path=root, patch_size=(24, 24, 24), mask_patch=8,
        batch_size=8, labeled_bs=4, labeled_oversample=2,
        device_data_cache=True, compute_dtype="float32")
    feeder = BCPBatchFeeder(cfg, stage="self")
    batch = next(feeder)
    assert batch["img_a"].shape == (2, 24, 24, 24, 1)
    assert batch["uimg_b"].shape == (2, 24, 24, 24, 1)
    feeder.close()


def test_device_cache_rejects_sharding():
    cfg = la_config().replace(device_data_cache=True)
    with pytest.raises(ValueError):
        BCPBatchFeeder(cfg, stage="pre", sharding="dummy")


def test_stacked_feed_matches_sequential(tmp_path_factory):
    """steps_per_dispatch's contract: the K-stacked device feed yields
    per-sub-step batches identical to K sequential draws of the same
    seed — including the self-train stage's labeled/unlabeled RNG
    interleaving (regression: the stacked builder once drew all K
    labeled batches' augmentations before any unlabeled ones)."""
    root = synthetic.make_la_dataset(
        str(tmp_path_factory.mktemp("la_stack")), n_train=6, n_test=2,
        shape=(40, 40, 32))
    cfg = la_config(labelnum=4).replace(
        root_path=root, patch_size=(32, 32, 16), batch_size=6,
        labeled_bs=4, max_samples=6, device_data_cache=True,
        compute_dtype="float32")
    K = 2
    seq = BCPBatchFeeder(cfg, stage="self", seed=7)
    singles = [next(seq) for _ in range(K)]
    seq.close()
    stk = BCPBatchFeeder(cfg, stage="self", seed=7, stack=K)
    stacked = next(stk)
    stk.close()
    for key in singles[0]:
        got = np.asarray(stacked[key])
        for k in range(K):
            np.testing.assert_array_equal(got[k],
                                          np.asarray(singles[k][key]),
                                          err_msg=f"{key} sub-step {k}")


def test_stacked_feed_matches_sequential_pancreas(tmp_path_factory):
    """The K-stacked pancreas device feed (steps_per_dispatch under the
    HBM cache, VERDICT r4 #2) yields per-sub-step batches identical to K
    sequential draws of the same seed — incl. the a/b labeled streams'
    per-sub-step RNG interleaving and the RNG-free center crops."""
    root = synthetic.make_pancreas_dataset(
        str(tmp_path_factory.mktemp("panc_stack")), shape=(40, 40, 40))
    cfg = pancreas_config().replace(
        root_path=root, patch_size=(24, 24, 24), mask_patch=8,
        batch_size=8, labeled_bs=4, labeled_oversample=2,
        device_data_cache=True, compute_dtype="float32")
    K = 2
    seq = BCPBatchFeeder(cfg, stage="self", seed=7)
    singles = [next(seq) for _ in range(K)]
    seq.close()
    stk = BCPBatchFeeder(cfg, stage="self", seed=7, stack=K)
    stacked = next(stk)
    stk.close()
    assert set(stacked) == set(singles[0])
    for key in singles[0]:
        got = np.asarray(stacked[key])
        for k in range(K):
            np.testing.assert_array_equal(got[k],
                                          np.asarray(singles[k][key]),
                                          err_msg=f"{key} sub-step {k}")


def test_stacked_feed_matches_sequential_acdc(tmp_path_factory):
    """The K-stacked ACDC device feed yields per-sub-step batches
    identical to K sequential draws of the same seed, incl. the ulab_*
    snapshot side-channels."""
    from bcp_tpu.config import acdc_config
    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_stack")), n_train_slices=40,
        n_val=2, slice_shape=(40, 36))
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        device_data_cache=True, compute_dtype="float32")
    K = 3
    seq = BCPBatchFeeder(cfg, stage="self", seed=5)
    singles = [next(seq) for _ in range(K)]
    seq.close()
    stk = BCPBatchFeeder(cfg, stage="self", seed=5, stack=K)
    stacked = next(stk)
    stk.close()
    assert set(stacked) == set(singles[0])
    assert "ulab_a" in stacked
    for key in singles[0]:
        got = np.asarray(stacked[key])
        for k in range(K):
            np.testing.assert_array_equal(got[k],
                                          np.asarray(singles[k][key]),
                                          err_msg=f"{key} sub-step {k}")


# ---------------------------------------------------------------------------
# DeviceSliceStore (ACDC)

def _slices(shapes, seed=0, n_classes=4):
    rng = np.random.default_rng(seed)
    imgs = [rng.random(s).astype(np.float32) for s in shapes]
    labs = [rng.integers(0, n_classes, s).astype(np.uint8) for s in shapes]
    return imgs, labs


def _host_aug(img, lab, mode, k, flip, angle, out):
    """Reference transform with forced params (the scipy oracle)."""
    from bcp_tpu.data import transforms
    if mode == 1:
        img, lab = np.rot90(img, k), np.rot90(lab, k)
        img, lab = np.flip(img, axis=flip), np.flip(lab, axis=flip)
    elif mode == 2:
        from scipy import ndimage
        img = ndimage.rotate(img, angle, order=0, reshape=False)
        lab = ndimage.rotate(lab, angle, order=0, reshape=False)
    return transforms.zoom_to(img, lab, out)


def test_slice_store_zoom_and_rotflip_bit_exact():
    """Modes 0/1 + the nearest zoom are pure index permutations + exact
    int32 zoom arithmetic -> bit-identical to the scipy host path, for
    every k/flip combination and non-square / swapped / square shapes."""
    from bcp_tpu.data.device_store import DeviceSliceStore
    shapes = [(37, 53), (53, 37), (40, 40), (64, 17)]
    imgs, labs = _slices(shapes)
    out = (32, 32)
    store = DeviceSliceStore(imgs, labs, out, img_dtype=jnp.float32)
    cases = [(i, 0, 0, 0) for i in range(len(shapes))]          # mode 0
    cases += [(i, 1, k, f) for i in range(len(shapes))
              for k in range(4) for f in range(2)]              # mode 1
    idx = np.array([c[0] for c in cases], np.int32)
    modes = np.array([c[1] for c in cases], np.int32)
    ks = np.array([c[2] for c in cases], np.int32)
    flips = np.array([c[3] for c in cases], np.int32)
    angles = np.zeros(len(cases), np.int32)
    got_img, got_lab = store.aug_batch((idx, modes, ks, flips, angles))
    for n, (i, m, k, f) in enumerate(cases):
        want_img, want_lab = _host_aug(imgs[i], labs[i], m, k, f, 0, out)
        np.testing.assert_array_equal(
            np.asarray(got_img[n, ..., 0]), want_img,
            err_msg=f"img case slice={i} mode={m} k={k} flip={f}")
        np.testing.assert_array_equal(
            np.asarray(got_lab[n]), want_lab,
            err_msg=f"lab case slice={i} mode={m} k={k} flip={f}")


def test_slice_store_rotate_matches_scipy_within_f32_bound():
    """Mode 2 computes source coordinates in f32 where scipy uses f64;
    only pixels whose coordinate sits within ~2e-5 of a rounding
    boundary may differ (device_store.DeviceSliceStore docstring)."""
    from bcp_tpu.data.device_store import DeviceSliceStore
    shapes = [(37, 53), (53, 37), (44, 44)] * 13   # 39 cases
    imgs, labs = _slices(shapes, seed=3)
    out = (32, 32)
    store = DeviceSliceStore(imgs, labs, out, img_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    idx = np.arange(len(shapes), dtype=np.int32)
    angles = rng.integers(-20, 20, len(shapes)).astype(np.int32)
    modes = np.full(len(shapes), 2, np.int32)
    zeros = np.zeros(len(shapes), np.int32)
    got_img, got_lab = store.aug_batch((idx, modes, zeros, zeros, angles))
    total = wrong = 0
    for n in range(len(shapes)):
        want_img, want_lab = _host_aug(imgs[n], labs[n], 2, 0, 0,
                                       int(angles[n]), out)
        wrong += (np.asarray(got_img[n, ..., 0]) != want_img).sum()
        wrong += (np.asarray(got_lab[n]) != want_lab).sum()
        total += 2 * want_img.size
    assert wrong / total < 1e-3, f"{wrong}/{total} pixels differ"


def test_acdc_feeder_device_cache_matches_host_feed(tmp_path_factory):
    """Same seed -> the device-cached ACDC feed yields the same batches
    as the host feed (sample-for-sample RNG order), up to the mode-2
    f32 boundary pixels."""
    from bcp_tpu.config import acdc_config
    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_dev")), n_train_slices=40,
        n_val=2, slice_shape=(40, 36))
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        compute_dtype="float32")
    host = BCPBatchFeeder(cfg, stage="self", seed=11)
    dev = BCPBatchFeeder(cfg.replace(device_data_cache=True),
                         stage="self", seed=11)
    for it in range(3):
        hb, db = next(host), next(dev)
        assert set(hb) == set(db)
        for key in sorted(hb):
            h = np.asarray(hb[key])
            d = np.asarray(db[key])
            assert h.shape == d.shape, (key, h.shape, d.shape)
            frac = (h != d).mean()
            assert frac < 1e-3, f"iter {it} {key}: {frac:.2e} differ"
    host.close()
    dev.close()


def test_acdc_feeder_device_cache_pre_stage(tmp_path_factory):
    from bcp_tpu.config import acdc_config
    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_dev_pre")), n_train_slices=40,
        n_val=2, slice_shape=(40, 36))
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        device_data_cache=True, compute_dtype="float32")
    feeder = BCPBatchFeeder(cfg, stage="pre", seed=1)
    batch = next(feeder)
    assert batch["img_a"].shape == (2, 32, 32, 1)
    assert batch["lab_a"].dtype == np.uint8
    assert "uimg_a" not in batch and "ulab_a" not in batch
    feeder.close()
