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

def test_kde_plot_smoke(tmp_path):
    from bcp_tpu.cli.kde_demo import plot_kde
    rng = np.random.default_rng(0)
    per_class = {c: {"labeled": rng.normal(size=200).tolist(),
                     "unlabeled": rng.normal(1.0, 1.0, size=200).tolist()}
                 for c in range(1, 4)}
    out = str(tmp_path / "kde.png")
    plot_kde(per_class, out, n_classes=4)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0
