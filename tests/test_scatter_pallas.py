"""Pallas windowed scatter-add vs numpy ground truth (TPU-only — the CPU
suite exercises the XLA fallback via tests/test_eval.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.ops.scatter import pallas_supported, scatter_add_windows

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Pallas TPU kernel; CPU runs the XLA fallback")


def test_scatter_add_windows_matches_numpy():
    rng = np.random.default_rng(0)
    score = np.zeros((160, 160, 128, 2), np.float32)
    probs = rng.random((16, 112, 112, 80, 2)).astype(np.float32)
    starts = np.stack([rng.integers(0, 48, 16), rng.integers(0, 48, 16),
                       rng.integers(0, 12, 16) * 4], axis=1).astype(np.int32)
    assert pallas_supported(probs.shape, score.shape)
    got = np.asarray(scatter_add_windows(
        jnp.asarray(score), jnp.asarray(probs), jnp.asarray(starts)))
    want = score.copy()
    for w in range(16):
        sx, sy, sz = starts[w]
        want[sx:sx + 112, sy:sy + 112, sz:sz + 80] += probs[w]
    np.testing.assert_array_equal(got, want)


def test_unsupported_shapes_fall_back():
    # x extent not a multiple of the slab height -> evaluator must use
    # the XLA loop
    assert not pallas_supported((4, 12, 12, 12, 2), (24, 24, 24, 2))
