"""Smoke + semantics tests for the jitted pre-train / self-train steps."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bcp_tpu.config import acdc_config, la_config, pancreas_config
from bcp_tpu.models import create_model
from bcp_tpu.train import (TrainState, build_optimizer, init_state,
                           make_pretrain_step, make_selftrain_step)
from bcp_tpu.train.state import lr_schedule


def tiny_la():
    return la_config().replace(patch_size=(16, 16, 16), batch_size=4,
                               labeled_bs=2)


def tiny_acdc():
    return acdc_config().replace(patch_size=(32, 32), batch_size=8,
                                 labeled_bs=4)


def tiny_pancreas():
    return pancreas_config().replace(patch_size=(16, 16, 16), mask_patch=8,
                                     batch_size=4, labeled_bs=2)


def make_batch(cfg, key, with_unlabeled):
    sub = cfg.labeled_sub_bs
    usub = cfg.unlabeled_sub_bs
    ks = jax.random.split(key, 6)
    spatial = cfg.patch_size
    batch = {
        "img_a": jax.random.normal(ks[0], (sub, *spatial, 1)),
        "img_b": jax.random.normal(ks[1], (sub, *spatial, 1)),
        "lab_a": jax.random.randint(ks[2], (sub, *spatial), 0,
                                    cfg.num_classes),
        "lab_b": jax.random.randint(ks[3], (sub, *spatial), 0,
                                    cfg.num_classes),
    }
    if with_unlabeled:
        batch["uimg_a"] = jax.random.normal(ks[4], (usub, *spatial, 1))
        batch["uimg_b"] = jax.random.normal(ks[5], (usub, *spatial, 1))
    return batch


def _host_copy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), tree)


def _leaf_delta(a, b):
    return max(float(jnp.abs(x - y).max()) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


@pytest.mark.parametrize("cfg_fn", [tiny_la, tiny_acdc, tiny_pancreas],
                         ids=["la", "acdc", "pancreas"])
def test_pretrain_step(cfg_fn):
    cfg = cfg_fn()
    model = create_model(cfg.net_type, cfg.num_classes)
    tx = build_optimizer(cfg, "pre")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    step = make_pretrain_step(model, tx, cfg)
    batch = make_batch(cfg, jax.random.PRNGKey(1), with_unlabeled=False)
    params_before = _host_copy(state.params)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert _leaf_delta(params_before, state.params) > 0
    # teacher untouched during pre-train
    assert _leaf_delta(params_before, state.teacher_params) == 0


@pytest.mark.parametrize("cfg_fn", [tiny_la, tiny_acdc, tiny_pancreas],
                         ids=["la", "acdc", "pancreas"])
def test_selftrain_step(cfg_fn):
    cfg = cfg_fn()
    model = create_model(cfg.net_type, cfg.num_classes)
    tx = build_optimizer(cfg, "self")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    step = make_selftrain_step(model, tx, cfg)
    batch = make_batch(cfg, jax.random.PRNGKey(1), with_unlabeled=True)
    t_before = _host_copy(state.teacher_params)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["loss"]))
    # teacher moved toward student via EMA
    assert _leaf_delta(t_before, state.teacher_params) > 0
    # teacher must lag the student (alpha=0.99)
    d_ts = _leaf_delta(state.teacher_params, state.params)
    assert d_ts > 0


def test_la_ema_params_only_vs_acdc_full():
    for cfg_fn, full in [(tiny_la, False), (tiny_acdc, True)]:
        cfg = cfg_fn()
        model = create_model(cfg.net_type, cfg.num_classes)
        tx = build_optimizer(cfg, "self")
        state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
        step = make_selftrain_step(model, tx, cfg)
        batch = make_batch(cfg, jax.random.PRNGKey(1), with_unlabeled=True)
        tbs_before = _host_copy(state.teacher_batch_stats)
        state, _ = step(state, batch, jax.random.PRNGKey(2))
        moved = _leaf_delta(tbs_before, state.teacher_batch_stats) > 0
        assert moved == full, (cfg.variant, full)


def test_lr_schedule_la_selftrain_decay():
    cfg = la_config()
    sched = lr_schedule(cfg, "self")
    assert float(sched(jnp.int32(0))) == pytest.approx(0.01)
    assert float(sched(jnp.int32(2499))) == pytest.approx(0.01)
    # reference sets lr=base*0.1**(iter//2500) right after iter 2500's
    # update, so the *2501st* update (0-based step 2500) uses 0.001
    assert float(sched(jnp.int32(2500))) == pytest.approx(0.001)
    assert float(sched(jnp.int32(5000))) == pytest.approx(1e-4, rel=1e-3)


def test_sgd_matches_torch_semantics():
    """optax chain(add_decayed_weights, trace, lr) == torch.optim.SGD with
    momentum+weight_decay, the optimizer of `LA_BCP_train.py:135`."""
    import optax
    cfg = tiny_la()
    w0 = np.array([1.0, -2.0, 3.0], np.float32)

    # torch trajectory
    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([wt], lr=0.01, momentum=0.9, weight_decay=1e-4)
    torch_traj = []
    for i in range(5):
        opt.zero_grad()
        loss = (wt ** 2).sum()
        loss.backward()
        opt.step()
        torch_traj.append(wt.detach().numpy().copy())

    # optax trajectory
    tx = build_optimizer(cfg, "pre")
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for i in range(5):
        grads = 2 * params
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params), torch_traj[i],
                                   rtol=1e-5)
