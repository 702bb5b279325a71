"""Grouped BatchNorm: a concat forward with bn_groups=2 must reproduce two
separate forwards (logits) and the sequential running-stat updates —
exactly the reference's two-sub-batch pattern (`LA_BCP_train.py:252-253`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.models import VNet3D
from bcp_tpu.train.steps import _apply_train


def test_grouped_equals_two_sequential_forwards():
    model1 = VNet3D(n_classes=2, n_filters=4, normalization="batchnorm",
                    has_dropout=False, bn_groups=1)
    model2 = model1.clone(bn_groups=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 16, 1))
    variables = model1.init({"params": jax.random.PRNGKey(1)},
                            x[:2], train=False)
    params, bs0 = variables["params"], variables["batch_stats"]
    key = jax.random.PRNGKey(2)

    # two sequential forwards, threading batch_stats (torch behaviour)
    l1, bs1 = _apply_train(model1, params, bs0, x[:2], key)
    l2, bs2 = _apply_train(model1, params, bs1, x[2:], key)

    # one grouped concat forward
    lg, bsg = _apply_train(model2, params, bs0, x, key)

    np.testing.assert_allclose(np.asarray(lg[:2]), np.asarray(l1),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lg[2:]), np.asarray(l2),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bsg),
                    jax.tree_util.tree_leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_grouped_eval_mode_ignores_groups():
    model2 = VNet3D(n_classes=2, n_filters=4, normalization="batchnorm",
                    bn_groups=2)
    model1 = model2.clone(bn_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    variables = model1.init({"params": jax.random.PRNGKey(1)}, x,
                            train=False)
    a, _ = model1.apply(variables, x, train=False)
    b, _ = model2.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
