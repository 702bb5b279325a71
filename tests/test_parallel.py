"""Multi-device (8 virtual CPU devices) data-parallel tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.config import la_config
from bcp_tpu.models import create_model
from bcp_tpu.parallel import (data_sharding, make_mesh, replicate_state,
                              shard_batch)
from bcp_tpu.train import build_optimizer, init_state, make_selftrain_step


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@requires_8
def test_mesh_and_shardings():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    batch = {"img_a": np.zeros((8, 4, 4, 4, 1), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["img_a"].sharding.device_set) == 8


@requires_8
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@requires_8
def test_dp_matches_single_device():
    """The DP-sharded self-train step must produce the same loss and
    updated params as the unsharded run of the same global batch."""
    n = 4
    cfg = la_config().replace(patch_size=(16, 16, 16),
                              batch_size=4 * n, labeled_bs=2 * n)
    model = create_model(cfg.net_type, cfg.num_classes)
    tx = build_optimizer(cfg, "self")
    step = make_selftrain_step(model, tx, cfg)

    sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    S = cfg.patch_size
    host_batch = {
        "img_a": jax.random.normal(ks[0], (sub, *S, 1)),
        "img_b": jax.random.normal(ks[1], (sub, *S, 1)),
        "lab_a": jax.random.randint(ks[2], (sub, *S), 0, 2),
        "lab_b": jax.random.randint(ks[3], (sub, *S), 0, 2),
        "uimg_a": jax.random.normal(ks[4], (usub, *S, 1)),
        "uimg_b": jax.random.normal(ks[5], (usub, *S, 1)),
    }
    host_batch = jax.device_get(host_batch)

    def run(sharded: bool):
        state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
        if sharded:
            mesh = make_mesh(n)
            state = replicate_state(state, mesh)
            batch = shard_batch(host_batch, mesh)
        else:
            batch = jax.device_put(host_batch)
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(metrics["loss"]), np.asarray(leaf)

    loss_1, leaf_1 = run(False)
    loss_n, leaf_n = run(True)
    assert loss_1 == pytest.approx(loss_n, rel=1e-4)
    np.testing.assert_allclose(leaf_1, leaf_n, rtol=1e-4, atol=1e-6)
