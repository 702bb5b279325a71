"""On-device connected components vs scipy.ndimage ground truth."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from bcp_tpu.ops import cc

RNG = np.random.default_rng(7)


def _scipy_largest_cc(mask, connectivity=None):
    """Reference behaviour of LargestCC_pancreas (LA_BCP_train.py:65-77):
    skimage.label (structure = connectivity) + argmax(bincount[1:])+1."""
    ndim = mask.ndim
    if connectivity is None:
        connectivity = ndim
    structure = ndi.generate_binary_structure(ndim, connectivity)
    labels, num = ndi.label(mask, structure=structure)
    if num == 0:
        return mask
    counts = np.bincount(labels.ravel())
    best = np.argmax(counts[1:]) + 1
    return (labels == best).astype(np.int32)


def _random_blobs(shape, p=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < p).astype(np.int32)


@pytest.mark.parametrize("connectivity", [1, 2, 3])
def test_component_count_3d(connectivity):
    m = _random_blobs((12, 12, 10), p=0.25, seed=1)
    labels = np.asarray(cc.connected_components(jnp.asarray(m),
                                                connectivity))
    structure = ndi.generate_binary_structure(3, connectivity)
    _, want_n = ndi.label(m, structure=structure)
    got_n = len(np.unique(labels[labels > 0]))
    assert got_n == want_n
    # component partition must agree with scipy's up to relabelling
    want_labels, _ = ndi.label(m, structure=structure)
    for lab in np.unique(labels[labels > 0]):
        member = labels == lab
        assert len(np.unique(want_labels[member])) == 1


@pytest.mark.parametrize("connectivity", [1, 2])
def test_largest_cc_2d_matches_scipy(connectivity):
    for seed in range(5):
        m = _random_blobs((24, 24), p=0.35, seed=seed)
        got = np.asarray(cc.largest_cc(jnp.asarray(m), connectivity))
        want = _scipy_largest_cc(m, connectivity)
        # sizes must match even if a tie picked a different component
        assert got.sum() == want.sum()


def test_largest_cc_3d_matches_scipy_full_connectivity():
    m = _random_blobs((10, 10, 8), p=0.3, seed=3)
    got = np.asarray(cc.largest_cc(jnp.asarray(m)))
    want = _scipy_largest_cc(m, None)
    np.testing.assert_array_equal(got.sum(), want.sum())


def test_largest_cc_empty_mask_passthrough():
    m = np.zeros((8, 8, 8), np.int32)
    got = np.asarray(cc.largest_cc(jnp.asarray(m)))
    assert got.sum() == 0


def test_largest_cc_snake():
    # A long thin connected snake must survive as one component.
    m = np.zeros((16, 16), np.int32)
    m[0, :] = 1
    m[:, -1] = 1
    m[-1, :] = 1
    m[1, 1] = 1  # small spur, 8-connected to the top row
    m[8, 4] = 1  # isolated voxel: must be removed
    got = np.asarray(cc.largest_cc(jnp.asarray(m), 2))
    assert got[8, 4] == 0
    assert got.sum() == m.sum() - 1


def test_get_cut_mask_threshold_and_nms():
    # logits (N, X, Y, Z, 2): class-1 prob >= 0.5 keeps largest blob only.
    logit = np.zeros((1, 8, 8, 4, 2), np.float32)
    logit[..., 0] = 2.0
    logit[0, 0:3, 0:3, :, 1] = 5.0   # big blob
    logit[0, 6, 6, 0, 1] = 5.0       # speck
    raw = np.asarray(cc.get_cut_mask(jnp.asarray(logit), nms=False))
    assert raw.sum() == 3 * 3 * 4 + 1
    cleaned = np.asarray(cc.get_cut_mask(jnp.asarray(logit), nms=True))
    assert cleaned.sum() == 3 * 3 * 4
    assert cleaned[0, 6, 6, 0] == 0


def test_get_multiclass_mask_per_class_nms():
    logit = np.zeros((1, 12, 12, 4), np.float32)
    logit[..., 0] = 1.0
    logit[0, 0:4, 0:4, 2] = 5.0      # class-2 big blob
    logit[0, 10, 10, 2] = 5.0        # class-2 speck
    logit[0, 6:8, 6:8, 1] = 5.0      # class-1 blob
    seg = np.asarray(cc.get_multiclass_mask(jnp.asarray(logit), 4, nms=True))
    assert seg[0, 10, 10] == 0
    assert (seg[0, 0:4, 0:4] == 2).all()
    assert (seg[0, 6:8, 6:8] == 1).all()


@pytest.mark.parametrize("connectivity", [1, 2, 3])
def test_scan_mode_matches_scipy_partition(connectivity):
    """scan_steps propagation (the CPU-default mode) produces the exact
    scipy component partition, same as pure sweeps."""
    m = _random_blobs((20, 18, 14), p=0.4, seed=7)
    labels = np.asarray(cc.connected_components(
        jnp.asarray(m), connectivity, inner_steps=2, scan_steps=1))
    structure = ndi.generate_binary_structure(3, connectivity)
    want_labels, want_n = ndi.label(m, structure=structure)
    assert len(np.unique(labels[labels > 0])) == want_n
    for lab in np.unique(labels[labels > 0]):
        assert len(np.unique(want_labels[labels == lab])) == 1
    assert (labels[m == 0] == 0).all()
