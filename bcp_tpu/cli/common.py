"""Shared CLI helpers."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from bcp_tpu.config import Config
from bcp_tpu.models import create_model
from bcp_tpu.train.checkpoints import CheckpointIO


def snapshot_dir(cfg: Config, stage_name: str) -> str:
    run = f"{cfg.name}_{cfg.exp}_{cfg.labelnum}_labeled"
    return os.path.join(cfg.snapshot_root, run, stage_name)


def eval_mesh(num_devices: int):
    """1-D device mesh for sharded offline eval (``--num_devices`` on the
    test CLIs; -1 = all chips), or None for the single-device path. The
    evaluators shard window/slice batches over it (C28)."""
    if num_devices in (None, 0, 1):
        return None
    n = jax.device_count() if num_devices == -1 else int(num_devices)
    if n > jax.device_count():
        raise SystemExit(f"error: --num_devices {n} but only "
                         f"{jax.device_count()} devices are visible")
    if n <= 1:
        return None
    from bcp_tpu.parallel import make_mesh
    return make_mesh(n)


def replicate_variables(variables, mesh):
    """Params/batch_stats on every chip of the eval mesh."""
    from bcp_tpu.parallel import replicated_sharding
    return jax.device_put(variables, replicated_sharding(mesh))


def load_eval_variables(cfg: Config, ckpt_path: str,
                        torch_ckpt: str = None):
    """Build the eval-mode model + restore weights/BN stats from a saved
    TrainState checkpoint (the `{model}_best_model` alias), or — when
    ``torch_ckpt`` is given — from a reference-trained torch ``.pth``
    (the `model.load_state_dict(torch.load(...))` hand-off,
    `code/test_LA.py:37`) via ``bcp_tpu.convert``."""
    dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(
        cfg.compute_dtype).type
    extra = {"n_filters": cfg.n_filters} if cfg.n_filters else {}
    model = create_model(cfg.net_type, cfg.num_classes, mode="test",
                         compute_dtype=dtype, **extra)
    if torch_ckpt:
        from bcp_tpu.convert import load_torch_checkpoint
        got = load_torch_checkpoint(torch_ckpt, cfg.net_type)
        variables = {"params": got["params"]}
        if got["batch_stats"]:
            variables["batch_stats"] = got["batch_stats"]
        return model, variables
    if not os.path.exists(ckpt_path):
        raise SystemExit(
            f"error: no checkpoint at {ckpt_path} — train the "
            f"'{cfg.name}' pipeline first (or pass the matching "
            f"--snapshot_root/--labelnum/--stage_name)")
    x = jnp.zeros((1, *cfg.patch_size, cfg.in_channels), jnp.float32)
    init_vars = create_model(
        cfg.net_type, cfg.num_classes, mode="train",
        compute_dtype=dtype, **extra).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    template = {"params": init_vars["params"],
                "batch_stats": init_vars.get("batch_stats", FrozenDict())}
    io = CheckpointIO()
    got = io._restore_sections(ckpt_path, template, partial=True)
    variables = {"params": got["params"]}
    if len(jax.tree_util.tree_leaves(got["batch_stats"])) > 0:
        variables["batch_stats"] = got["batch_stats"]
    return model, variables
