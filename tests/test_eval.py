"""Eval engine tests.

The batched device sliding-window engine is checked against a direct
numpy re-implementation of the reference's window loop
(`test_3d_patch.py:82-141`) running the same flax model — same grid, same
accumulate-normalize, same decision rule. Metrics are checked on
analytically solvable shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.eval import (Slice2DEvaluator, SlidingWindowEvaluator,
                          calculate_metric_percase, dice_binary, hd95, asd,
                          jaccard_binary, host_largest_cc)
from bcp_tpu.eval.sliding_window import pad_to_patch, window_starts
from bcp_tpu.models import UNet2D, VNet3D


# ---------------- metrics ----------------

def test_dice_jaccard_identical_masks():
    m = np.zeros((8, 8, 8), bool)
    m[2:5, 2:5, 2:5] = True
    assert dice_binary(m, m) == 1.0
    assert jaccard_binary(m, m) == 1.0


def test_dice_value():
    a = np.zeros((10,), bool); a[:6] = True
    b = np.zeros((10,), bool); b[2:8] = True
    # |A.B|=4, |A|+|B|=12 -> dice 2/3 ; union=8 -> jaccard 1/2
    assert dice_binary(a, b) == pytest.approx(2 / 3)
    assert jaccard_binary(a, b) == pytest.approx(0.5)


def test_surface_distances_exact_single_pixels():
    """Single pixels: the whole mask is border; closed-form distances."""
    a = np.zeros((8, 8), bool); a[0, 0] = True
    b = np.zeros((8, 8), bool); b[3, 0] = True
    assert asd(a, b) == 3.0            # one border pixel, distance 3
    assert asd(b, a) == 3.0
    assert hd95(a, b) == 3.0           # percentile of [3, 3]


def test_surface_distances_exact_shifted_line():
    """1-pixel-thick lines (all voxels are border under the conn-1
    erosion): shifting by 4 makes every symmetric distance exactly 4."""
    a = np.zeros((10, 10), bool); a[0:3, 0] = True
    b = np.zeros((10, 10), bool); b[0:3, 4] = True
    assert asd(a, b) == 4.0
    assert hd95(a, b) == 4.0


def test_surface_distances_exact_percentile_interpolation():
    """Non-uniform multiset {0,1,2,3,3} + {0}: checks np.percentile's
    linear interpolation exactly, like medpy's hd95 (`medpy.metric.binary
    .hd95`: 95th of hstack(d(a->b), d(b->a)))."""
    a = np.zeros((8, 8), bool)
    for p in ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0)):
        a[p] = True
    b = np.zeros((8, 8), bool); b[0, 0] = True
    assert asd(a, b) == pytest.approx((0 + 1 + 2 + 3 + 3) / 5, abs=1e-12)
    assert asd(b, a) == 0.0
    # hstack -> sorted [0, 0, 1, 2, 3, 3]; idx = 0.95*5 = 4.75
    expect = 3.0 + 0.75 * (3.0 - 3.0)
    assert hd95(a, b) == pytest.approx(expect, abs=1e-12)


def test_surface_distances_exact_diagonal_and_spacing():
    """Euclidean (not chessboard) distances, and voxelspacing scaling
    (the ACDC protocol passes spacing, `test_ACDC.py:86-91`)."""
    a = np.zeros((6, 6), bool); a[0, 0] = True; a[2, 2] = True
    b = np.zeros((6, 6), bool); b[0, 0] = True
    assert asd(a, b) == pytest.approx(np.sqrt(8.0) / 2, abs=1e-12)
    # anisotropic spacing (2, 1): the (2,2) pixel sits at physical (4, 2)
    assert asd(a, b, voxelspacing=(2.0, 1.0)) == pytest.approx(
        np.sqrt(4.0 ** 2 + 2.0 ** 2) / 2, abs=1e-12)


def _brute_surface_distances(res: np.ndarray, ref: np.ndarray):
    """Independent oracle: border sets by explicit 6-neighbourhood
    inspection (zero-padded, = medpy's conn-1 erosion convention) and
    exact pairwise Euclidean distances — no scipy EDT, no shared code
    with the implementation."""
    def border(m):
        mp = np.pad(m, 1)
        keep = np.ones_like(mp)
        for ax in range(m.ndim):
            keep &= np.roll(mp, 1, ax) & np.roll(mp, -1, ax)
        interior = (mp & keep)[(slice(1, -1),) * m.ndim]
        return np.argwhere(m & ~interior)
    rb, fb = border(res), border(ref)
    d = np.sqrt((((rb[:, None, :] - fb[None, :, :]) ** 2)
                 .sum(-1)).min(1))
    return d


def test_surface_distances_match_brute_force_oracle():
    """Thick nonconvex 3D blobs: hd95/asd equal an independently computed
    pairwise-distance oracle to 1e-12 (EDT is exact on integer grids)."""
    a = np.zeros((12, 12, 12), bool); a[2:9, 3:10, 2:7] = True
    a[4:6, 1:4, 8:11] = True          # attached lobe -> nonconvex border
    b = np.zeros((12, 12, 12), bool); b[4:11, 2:8, 4:10] = True
    d1 = _brute_surface_distances(a, b)
    d2 = _brute_surface_distances(b, a)
    assert asd(a, b) == pytest.approx(d1.mean(), abs=1e-12)
    assert asd(b, a) == pytest.approx(d2.mean(), abs=1e-12)
    assert hd95(a, b) == pytest.approx(
        np.percentile(np.hstack((d1, d2)), 95), abs=1e-12)


def test_surface_distances_kdtree_equals_edt_fallback(monkeypatch):
    """The KD-tree fast path and the dense-border EDT fallback are the
    same function: random blobby masks, isotropic + anisotropic spacing,
    element-exact to float rounding."""
    from bcp_tpu.eval import metrics as M
    rng = np.random.default_rng(7)
    zz, yy, xx = np.ogrid[:8, :40, :36]
    for _ in range(3):
        c = rng.integers(2, 6), rng.integers(10, 30), rng.integers(10, 26)
        a = ((zz - c[0]) ** 2 / 5 + (yy - c[1]) ** 2 / 60
             + (xx - c[2]) ** 2 / 40) < 1
        b = ((zz - c[0] - 1) ** 2 / 4 + (yy - c[1] - 3) ** 2 / 50
             + (xx - c[2] + 2) ** 2 / 55) < 1
        for vs in (None, (5.0, 1.25, 1.25)):
            d_kd = M._surface_distances(a, b, vs)
            monkeypatch.setattr(M, "_KDTREE_MAX_PTS", 0)
            d_edt = M._surface_distances(a, b, vs)
            monkeypatch.undo()
            assert d_kd.shape == d_edt.shape
            np.testing.assert_allclose(d_kd, d_edt, rtol=0, atol=1e-12)


def test_hd95_zero_for_identical():
    m = np.zeros((8, 8), bool)
    m[2:6, 2:6] = True
    assert hd95(m, m) == 0.0
    assert asd(m, m) == 0.0


def test_host_largest_cc():
    m = np.zeros((10, 10), np.int32)
    m[0:4, 0:4] = 1
    m[8, 8] = 1
    out = host_largest_cc(m)
    assert out[0, 0] and not out[8, 8]


# ---------------- sliding window ----------------

def _naive_sliding_window(apply_fn, image, patch, stride_xy, stride_z,
                          num_classes):
    """Direct re-implementation of the reference loop
    (`test_3d_patch.py:82-141`) in numpy, batch-1 forwards."""
    image, off = pad_to_patch(image.astype(np.float32), patch)
    score = np.zeros((*image.shape, num_classes), np.float32)
    cnt = np.zeros(image.shape, np.float32)
    for s in window_starts(image.shape, patch, stride_xy, stride_z):
        x0, y0, z0 = s
        tile = image[x0:x0 + patch[0], y0:y0 + patch[1], z0:z0 + patch[2]]
        probs = apply_fn(tile[None, ..., None])[0]
        score[x0:x0 + patch[0], y0:y0 + patch[1], z0:z0 + patch[2]] += probs
        cnt[x0:x0 + patch[0], y0:y0 + patch[1], z0:z0 + patch[2]] += 1
    score /= cnt[..., None]
    label = (score[..., 1] > 0.5).astype(np.int32)
    return label, score


@pytest.fixture(scope="module")
def small_vnet():
    model = VNet3D(n_classes=2, n_filters=2, normalization="batchnorm",
                   has_dropout=False)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    return model, variables


def test_sliding_window_matches_naive_loop(small_vnet):
    model, variables = small_vnet
    patch = (16, 16, 16)
    image = np.random.default_rng(0).normal(
        size=(23, 19, 21)).astype(np.float32)

    def apply_fn(x):
        logits, _ = model.apply(variables, jnp.asarray(x), train=False)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    want_label, want_score = _naive_sliding_window(
        apply_fn, image, patch, stride_xy=6, stride_z=6, num_classes=2)

    ev = SlidingWindowEvaluator(model, patch, num_classes=2, stride_xy=6,
                                stride_z=6, batch=4, bucket=(8, 8, 8))
    got_label, got_score = ev.infer(variables, image)
    assert got_label.shape == image.shape
    np.testing.assert_allclose(got_score, np.moveaxis(want_score, -1, 0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got_label, want_label)


def test_sliding_window_small_volume_padding(small_vnet):
    model, variables = small_vnet
    ev = SlidingWindowEvaluator(model, (16, 16, 16), 2, 6, 6, batch=4,
                                bucket=(8, 8, 8))
    image = np.random.default_rng(1).normal(size=(10, 12, 9))
    label, score = ev.infer(variables, image)
    assert label.shape == (10, 12, 9)
    assert score.shape == (2, 10, 12, 9)


def test_sliding_window_argmax_rule(small_vnet):
    model, variables = small_vnet
    ev = SlidingWindowEvaluator(model, (16, 16, 16), 2, 8, 8, batch=4)
    image = np.random.default_rng(2).normal(size=(20, 20, 18))
    label, score = ev.infer(variables, image, rule="argmax")
    want = np.argmax(score, axis=0)
    np.testing.assert_array_equal(label, want)


def test_validate_dice_runs(small_vnet):
    model, variables = small_vnet
    ev = SlidingWindowEvaluator(model, (16, 16, 16), 2, 8, 8, batch=4)
    image = np.random.default_rng(3).normal(size=(18, 18, 18))
    lab = np.zeros_like(image, dtype=np.int32)
    lab[4:10, 4:10, 4:10] = 1
    d = ev.validate_dice(variables, [(image, lab)])
    assert 0.0 <= d <= 1.0


# ---------------- 2D slices ----------------

def test_slice2d_shapes():
    model = UNet2D(n_classes=4, feature_chns=(4, 8, 16, 32, 64))
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    ev = Slice2DEvaluator(model, patch_size=(32, 32), num_classes=4)
    image = np.random.default_rng(0).normal(size=(5, 40, 44))
    pred = ev.predict_volume(variables, image)
    assert pred.shape == (5, 40, 44)
    label = np.zeros((5, 40, 44), np.int32)
    label[:, 10:20, 10:20] = 1
    m = ev.validate_volume(variables, image, label)
    assert len(m) == 3 and all(len(t) == 2 for t in m)
    full, pred2 = ev.test_volume(variables, image, label)
    assert len(full) == 3 and all(len(t) == 4 for t in full)


def test_slice2d_batched_zoom_matches_per_slice_loop():
    """The evaluator's single 3-D ndimage.zoom (slice factor 1.0) must be
    bit-identical to the reference's per-slice 2-D zoom loop
    (`val_2d.py:27-37`), both zooming in (float image) and back out
    (int label), including non-divisible in-plane shapes."""
    from scipy import ndimage
    rng = np.random.default_rng(7)
    for n, x, y in [(5, 40, 44), (20, 256, 216), (3, 250, 217), (1, 30, 30)]:
        img = rng.normal(size=(n, x, y)).astype(np.float32)
        px, py = 32, 32
        batched = ndimage.zoom(img, (1.0, px / x, py / y), order=0)
        looped = np.stack([
            ndimage.zoom(img[i], (px / x, py / y), order=0)
            for i in range(n)])
        np.testing.assert_array_equal(batched, looped)
        lab = rng.integers(0, 4, size=(n, px, py))
        back_b = ndimage.zoom(lab, (1.0, x / px, y / py), order=0)
        back_l = np.stack([
            ndimage.zoom(lab[i], (x / px, y / py), order=0)
            for i in range(n)])
        assert back_b.shape == (n, x, y)
        np.testing.assert_array_equal(back_b, back_l)


def test_count_map_not_reused_across_same_bucket_grids(small_vnet):
    """Two volumes can share the padded bucket, window count, and strides
    while having different window grids (the last start per axis sits at
    dim - patch) — the cached count map must not cross over (regression:
    the cache once keyed on (bucket, n_windows, strides) only)."""
    model, variables = small_vnet
    patch = (16, 16, 16)

    def apply_fn(x):
        logits, _ = model.apply(variables, jnp.asarray(x), train=False)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    ev = SlidingWindowEvaluator(model, patch, num_classes=2, stride_xy=6,
                                stride_z=6, batch=4, bucket=(8, 8, 8))
    rng = np.random.default_rng(2)
    # x-extents 21 and 23 both bucket to 24 and both give
    # ceil((x-16)/6)+1 = 2 x-starts: {0, 5} vs {0, 7}
    for shape in [(21, 19, 21), (23, 19, 21)]:
        image = rng.normal(size=shape).astype(np.float32)
        want_label, want_score = _naive_sliding_window(
            apply_fn, image, patch, stride_xy=6, stride_z=6,
            num_classes=2)
        got_label, got_score = ev.infer(variables, image)
        np.testing.assert_allclose(
            got_score, np.moveaxis(want_score, -1, 0),
            rtol=1e-4, atol=1e-5, err_msg=f"shape {shape}")
        np.testing.assert_array_equal(got_label, want_label)


def test_sliding_window_dtc_dual_head():
    """Dual-task models run through the sliding-window engine the way
    `test_DTC_single_case` does (`pancreas/test_util.py:29-86`): the
    FIRST head (out_tanh) is softmaxed into the score map, argmax rule.
    Verified against a naive numpy loop on `unet_3D_dtc`; `unetr_dtc`
    shape-tested end-to-end."""
    from bcp_tpu.models import create_model

    model = create_model("unet_3D_dtc", class_num=2,
                         feat_channels=(2, 4, 4, 8, 8))
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    image = np.random.default_rng(3).normal(
        size=(20, 18, 17)).astype(np.float32)

    def apply_fn(t):
        out_tanh, _ = model.apply(variables, jnp.asarray(t), train=False)
        return np.asarray(jax.nn.softmax(out_tanh, axis=-1))

    _, want_score = _naive_sliding_window(
        apply_fn, image, (16, 16, 16), stride_xy=4, stride_z=4,
        num_classes=2)
    want_label = np.argmax(want_score, axis=-1)

    ev = SlidingWindowEvaluator(model, (16, 16, 16), 2, 4, 4, batch=4,
                                bucket=(8, 8, 8))
    got_label, got_score = ev.infer(variables, image, rule="argmax")
    np.testing.assert_allclose(got_score, np.moveaxis(want_score, -1, 0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got_label, want_label)

    # unetr_dtc end-to-end shape check (patch must match its img_shape)
    m2 = create_model("unetr_dtc", class_num=2, img_shape=(16, 16, 16),
                      embed_dim=32, patch_size=16, num_heads=2,
                      num_layers=4, d_ff=64, ext_layers=(1, 2, 3, 4),
                      width_scale=0.125)
    v2 = m2.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    ev2 = SlidingWindowEvaluator(m2, (16, 16, 16), 2, 8, 8, batch=2,
                                 bucket=(8, 8, 8))
    lab2, sc2 = ev2.infer(v2, image, rule="argmax")
    assert lab2.shape == image.shape and sc2.shape == (2, *image.shape)
