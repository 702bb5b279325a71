"""Inventory-completeness extras: bbox utils, ensemble inference,
statistics helpers, Measures meters, feature memory + contrastive loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.extras import (ClassSelector, FeatureMemory,
                            contrastive_class_to_class)
from bcp_tpu.models import VNet3D
from bcp_tpu.ops.masks import bbox_mask, bbox_nd
from bcp_tpu.utils import logging as blog
from bcp_tpu.utils import statistic


# ---------------- bbox ----------------

def test_bbox_nd():
    m = np.zeros((10, 12, 8), np.int32)
    m[2:5, 3:9, 1:4] = 1
    b = np.asarray(bbox_nd(jnp.asarray(m)))
    np.testing.assert_array_equal(b, [[2, 5], [3, 9], [1, 4]])


def test_bbox_nd_empty():
    b = np.asarray(bbox_nd(jnp.zeros((4, 4), jnp.int32)))
    np.testing.assert_array_equal(b, [[0, 1], [0, 1]])


def test_bbox_mask_batched():
    m = np.zeros((2, 6, 6), np.int32)
    m[0, 1:3, 2:5] = 1
    m[1, 4:6, 0:2] = 1
    out = np.asarray(bbox_mask(jnp.asarray(m)))
    assert (out[0, 1:3, 2:5] == 0).all()
    assert out[0].sum() == 36 - 6
    assert (out[1, 4:6, 0:2] == 0).all()


# ---------------- ensemble inference ----------------

def test_sliding_window_ensemble_averages_logits():
    from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
    model = VNet3D(n_classes=2, n_filters=2, has_dropout=False)
    x = jnp.zeros((1, 16, 16, 16, 1))
    v1 = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    ev = SlidingWindowEvaluator(model, (16, 16, 16), 2, 8, 8, batch=4)
    image = np.random.default_rng(0).normal(size=(18, 18, 18))
    la, sa = ev.infer(v1, image)
    lb, sb = ev.infer([v1, v2], image)
    assert lb.shape == la.shape
    # ensemble differs from single model (different params)
    assert not np.allclose(sa, sb)
    # ensemble of the same model twice == the single model
    lc, sc = ev.infer([v1, v1], image)
    np.testing.assert_allclose(sc, sa, rtol=1e-5, atol=1e-6)


# ---------------- statistics ----------------

def test_dice_ratio():
    m = np.zeros((4, 4)); m[:2] = 1
    l = np.zeros((4, 4)); l[1:3] = 1
    # inter=4, sums 8+8 -> 2*4/(16+1e-6)
    assert statistic.dice_ratio(m, l) == pytest.approx(0.5, rel=1e-5)


def test_cal_dice_vector():
    pred = np.array([0, 1, 1, 2, 2])
    gt = np.array([0, 1, 2, 2, 2])
    d = statistic.cal_dice(pred, gt, num=3)
    assert d[0] == pytest.approx(2 * 1 / (2 + 1))
    assert d[1] == pytest.approx(2 * 2 / (2 + 3))


def test_precision_recall():
    p, r = statistic.precision_recall([1, 1, 0, 0], [1, 0, 1, 0])
    assert p == pytest.approx(0.5) and r == pytest.approx(0.5)


# ---------------- meters ----------------

def test_measures_meter(tmp_path):
    from bcp_tpu.utils.logging import MetricWriter
    w = MetricWriter(None)
    m = blog.cut_pre_measures(w, None)
    m.update(ce_loss=1.0, dice_loss=0.5, loss_all=0.75, train_dice=0.9)
    m.update(ce_loss=0.0, dice_loss=0.5, loss_all=0.25, train_dice=0.7)
    assert m.measures["ce_loss"].avg == pytest.approx(0.5)
    m.log(1, 2)  # no-op writer, no logger: must not raise
    m.reset()
    assert m.measures["ce_loss"].count == 0


# ---------------- feature memory + contrastive ----------------

def test_feature_memory_and_contrastive_loss():
    rng = np.random.default_rng(0)
    feat_dim, n_classes = 8, 2
    selector = ClassSelector(feat_dim=feat_dim)
    x0 = jnp.zeros((4, feat_dim))
    sel_vars = [selector.init({"params": jax.random.PRNGKey(c)}, x0)
                for c in range(n_classes)]
    fns = {c: (lambda v: (lambda f: selector.apply(v, f)))(sel_vars[c])
           for c in range(n_classes)}

    mem = FeatureMemory(elements_per_class=4, n_classes=n_classes)
    feats = jnp.asarray(rng.normal(size=(20, feat_dim)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, size=(20,)))
    mem.add_features(fns, feats, labels)
    for c in range(n_classes):
        assert mem.memory[c] is not None
        assert mem.memory[c].shape[0] <= 4

    loss = contrastive_class_to_class(fns, fns, feats, np.asarray(labels),
                                      n_classes, mem.memory)
    assert np.isfinite(float(loss))
    assert float(loss) > 0


# ---------------- KDE demo plotting ----------------

def test_kde_select_correct_pixels():
    # the reference intersects prediction with ground truth per half
    # (`KDE_demo.py:74-76`): only correctly-predicted pixels survive
    from bcp_tpu.cli.kde_demo import select_correct_pixels
    pred = np.array([2, 2, 0, 2, 0, 2, 2, 0])
    lab = np.array([2, 0, 2, 2, 0, 2, 0, 2])
    cor_l, cor_u = select_correct_pixels(pred, lab, 2, labeled_pixel=4)
    np.testing.assert_array_equal(cor_l, [0, 3])    # pred==lab==2
    np.testing.assert_array_equal(cor_u, [5])       # global row index


def test_kde_plot_reference_protocol(tmp_path):
    """plot_kde follows `KDE_demo.py:66-103`: correct-pixel intersection,
    per-pixel feature-mean statistic, and the KDE/ACDC/{f_dim}/labeled_N/
    class_c output tree + filename."""
    from bcp_tpu.cli.kde_demo import plot_kde
    rng = np.random.default_rng(0)
    P, f_dim = 400, 16
    feats = rng.normal(size=(P, f_dim)).astype(np.float32)
    pred = rng.integers(0, 4, P)
    lab = pred.copy()
    # make some pixels incorrect so the intersection matters
    lab[::7] = (pred[::7] + 1) % 4
    path = plot_kde(feats, pred, lab, specific_c=2, f_dim=f_dim,
                    pic_num=3, labelnum=7, out_dir=str(tmp_path))
    expected = (tmp_path / "KDE" / "ACDC" / "16" / "labeled_7" /
                "class_2" / "kde_test_mean3_7_2.png")
    assert path == str(expected)
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 0
    # degenerate case: no correct pixels on one side -> None, no crash
    assert plot_kde(feats, pred, np.full(P, 3), 2, f_dim, 0, 7,
                    str(tmp_path)) is None


# ---------------- statistics-library tail (C22) ----------------
# torch oracles below transcribe the *semantics* of
# pancreas/statistic.py:46-198 independently of bcp_tpu's numpy
# implementations.

def _dice_mc_oracle(masks, labels, classes):
    import torch
    masks = torch.as_tensor(masks)
    labels = torch.as_tensor(labels)
    num = labels.size(0)
    cd = torch.zeros(num)
    pcd = torch.zeros(num, classes)
    pcc = torch.zeros(num, classes)
    ti = tp = tl = 0.0
    for i in range(num):
        for n in range(1, classes):
            if (labels[i] == n).sum():
                pred = masks[i] == n
                labs = labels[i] == n
                ins = pred * labs
                pcd[i, n - 1] = ((2 * ins.sum()).float()
                                 / (pred.sum() + labs.sum()).float())
                pcc[i, n - 1] += 1
                ti += ins.sum(); tp += pred.sum(); tl += labs.sum()
        cd[i] = (2 * ti).float() / (tp + tl).float()
    return (float(cd.sum() / num),
            (pcd.sum(0) / (pcc.sum(0) + 1e-5)).numpy())


def _dice_m_oracle(masks, labels, classes):
    import torch
    m1 = torch.as_tensor(masks).view(len(masks), -1)
    m2 = torch.as_tensor(labels).view(len(labels), -1)
    num = m1.shape[0]
    cd = torch.zeros(num)
    pcd = torch.zeros(num, classes)
    c1 = torch.zeros(num, classes)
    c2 = torch.zeros(num, classes)
    ic = torch.zeros(num, classes)
    for i in range(num):
        for j in range(m1.shape[1]):
            if m1[i, j] != 0:
                if m1[i, j] == m2[i, j]:
                    ic[i, m1[i, j] - 1] += 1
                c1[i, m1[i, j] - 1] += 1
            if m2[i, j] != 0:
                c2[i, m2[i, j] - 1] += 1
        pcd[i] = (2 * ic[i]) / (c1[i] + c2[i])
        cd[i] = (2 * ic[i].sum()) / (c1[i].sum() + c2[i].sum())
    return float(cd.sum() / num), (pcd.sum(0) / num).numpy()


def test_dice_mc_matches_oracle():
    rng = np.random.default_rng(0)
    masks = rng.integers(0, 4, (3, 6, 6))
    labels = rng.integers(0, 4, (3, 6, 6))
    a0, p0 = _dice_mc_oracle(masks, labels, 4)
    a1, p1 = statistic.dice_mc(masks, labels, 4)
    assert a1 == pytest.approx(a0, abs=1e-6)
    np.testing.assert_allclose(p1, p0, atol=1e-6)
    # the cumulative-totals quirk: a later perfect sample still scores < 1
    m = np.stack([np.zeros((4, 4), int), np.ones((4, 4), int)])
    l = np.stack([np.ones((4, 4), int), np.ones((4, 4), int)])
    aver, _ = statistic.dice_mc(m, l, 2)
    o_aver, _ = _dice_mc_oracle(m, l, 2)
    assert aver == pytest.approx(o_aver, abs=1e-6)
    assert aver < 1.0


def test_dice_m_matches_oracle():
    rng = np.random.default_rng(1)
    masks = rng.integers(0, 3, (3, 5, 5))
    labels = rng.integers(0, 3, (3, 5, 5))
    a0, p0 = _dice_m_oracle(masks, labels, 2)
    a1, p1 = statistic.dice_m(masks, labels, 2)
    assert a1 == pytest.approx(a0, abs=1e-6)
    np.testing.assert_allclose(p1, p0, atol=1e-6)
    # 0/0 per-class entries are NaN, as in torch
    a, p = statistic.dice_m(np.zeros((1, 4), int), np.zeros((1, 4), int), 2)
    assert np.isnan(a) and np.isnan(p).all()


def test_hausdorff_mad_distance():
    from scipy.spatial.distance import cdist
    rng = np.random.default_rng(2)
    s1 = rng.normal(size=(10, 3))
    s2 = rng.normal(size=(7, 3))
    d = cdist(s1, s2)
    expected = max(d.min(axis=0).max(), d.min(axis=1).max())
    got = statistic.hausdorff_mad_distance(s1, s2)
    assert got == pytest.approx(expected, abs=1e-12)
    # symmetric; empty set returns max_ahd
    assert statistic.hausdorff_mad_distance(s2, s1) == pytest.approx(got)
    assert statistic.hausdorff_mad_distance([], s2) == np.inf
    assert statistic.hausdorff_mad_distance(s1, [], max_ahd=7.0) == 7.0


def test_acc_acc_test_acc_m():
    import torch
    rng = np.random.default_rng(3)
    mk = rng.integers(0, 2, (5, 5))
    lb = rng.integers(0, 2, (5, 5))
    mc = rng.integers(0, 2, (5, 5))

    a, same, n = statistic.acc(mk, lb)
    assert n == 25 and same == float((mk == lb).sum())
    assert a == pytest.approx(same / 25)

    # oracle for the masks==0 restriction
    sel = mk.reshape(-1) == 0
    m1 = torch.as_tensor(mc.reshape(-1)[sel]).float()
    m2 = torch.as_tensor(lb.reshape(-1)[sel]).float()
    o_same = float((m1 == m2).sum())
    o_inter = float((m1 * m2).sum())
    o_dice = 2 * o_inter / (float(m1.sum()) + float(m2.sum()) + 1.0)

    same_, dice, same0, same1, mis0, mis1, nn = statistic.acc_test(mk, lb, mc)
    assert same_ == o_same and nn == int(sel.sum())
    assert dice == pytest.approx(o_dice, abs=1e-9)
    assert same0 == o_same - o_inter and same1 == o_inter
    assert mis0 == float(((m1 != m2) & (m2 == 1)).sum())
    assert mis1 == float(((m1 != m2) & (m2 == 0)).sum())

    same_, dice, f0, f1 = statistic.acc_m(mk, lb, mc)
    assert same_ == o_same and dice == pytest.approx(o_dice, abs=1e-9)
    assert f0 == pytest.approx((o_same - o_inter) / o_same)
    assert f1 == pytest.approx(o_inter / o_same)


def test_pre_rec():
    p, r = statistic.pre_rec([1, 1, 0, 0], [1, 0, 1, 0])
    assert p == pytest.approx(1 / (2 + 1e-6), rel=1e-9)
    assert r == pytest.approx(1 / (2 + 1e-6), rel=1e-9)
