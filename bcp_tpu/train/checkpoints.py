"""Checkpoint I/O on orbax.

Mirrors the reference's conventions (`LA_BCP_train.py:79-93,176-189`):
best-validation snapshots named ``iter_{i}_dice_{d}`` plus a stable
``{model}_best_model`` alias, saving net + optimizer for the pre-train ->
self-train hand-off ('net'/'opt' dicts in the reference; here the whole
TrainState, which also enables true mid-run resume — something the
reference cannot do, SURVEY.md §5).

States are stored as a section dict (params / batch_stats / teacher_* /
opt_state / step) so a weights-only hand-off can partially restore even
when the two stages' optimizer trees differ (LA self-train adds an lr
schedule, `LA_BCP_train.py:273-276`).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from bcp_tpu.train.state import TrainState


def _sections(state: TrainState) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "teacher_params": state.teacher_params,
        "teacher_batch_stats": state.teacher_batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def _copy(tree):
    return jax.tree_util.tree_map(jnp.copy, tree)


class CheckpointIO:
    def __init__(self):
        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, path: str, state: TrainState):
        path = os.path.abspath(path)
        self._ckpt.save(path, args=ocp.args.PyTreeSave(_sections(state)),
                        force=True)

    def save_many(self, paths, state: TrainState):
        """Save the same state to several paths (tagged + best + last at
        a validation boundary) with ONE device->host fetch and ONE disk
        write: on a tunneled device each orbax save of the device tree
        re-pulls ~115 MB of params/teacher/opt through the link, and on
        the 1-core host each extra alias re-serialises the same bytes
        (7-26 s/validation in the r5 LA run). Fetch once, orbax-save the
        first path, then hardlink-replicate the finished directory for
        the aliases (orbax never mutates files in place — a finalized
        checkpoint is rewritten whole on the next save — so shared
        inodes are safe)."""
        host = jax.device_get(_sections(state))
        first = os.path.abspath(paths[0])
        self._ckpt.save(first, args=ocp.args.PyTreeSave(host), force=True)
        for path in paths[1:]:
            self._replicate(first, os.path.abspath(path))

    @staticmethod
    def _replicate(src: str, dst: str):
        """Alias a finalized checkpoint dir: hardlink every file (same
        filesystem; falls back to a byte copy), then rename into place
        like orbax's own finalize step."""
        def _link(s, d):
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
        tmp = dst + ".tmp_replica"
        for stale in (dst, tmp):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        shutil.copytree(src, tmp, copy_function=_link)
        os.rename(tmp, dst)

    def _restore_sections(self, path: str, template: Dict[str, Any],
                          partial: bool) -> Dict[str, Any]:
        path = os.path.abspath(path)
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        return self._ckpt.restore(
            path, args=ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args,
                partial_restore=partial))

    def restore(self, path: str, template: TrainState) -> TrainState:
        """Full resume: every section incl. optimizer state and step."""
        got = self._restore_sections(path, _sections(template),
                                     partial=False)
        return template.replace(**got)

    def restore_weights_only(self, path: str,
                             template: TrainState) -> TrainState:
        """`load_net` semantics (`LA_BCP_train.py:91-93`): student weights
        + BN stats from the checkpoint; optimizer and step fresh. Teacher
        is re-seeded from the restored student (`LA_BCP_train.py:220-222`
        loads both from the same file)."""
        sub = {"params": _sections(template)["params"],
               "batch_stats": _sections(template)["batch_stats"]}
        got = self._restore_sections(path, sub, partial=True)
        return template.replace(
            params=got["params"], batch_stats=got["batch_stats"],
            teacher_params=_copy(got["params"]),
            teacher_batch_stats=_copy(got["batch_stats"]))

    def restore_with_opt(self, path: str,
                         template: TrainState) -> TrainState:
        """`load_net_opt` semantics (`ACDC_BCP_train.py:335-336`): student
        + optimizer from the checkpoint, teacher from the same weights,
        step fresh."""
        tpl = _sections(template)
        sub = {"params": tpl["params"], "batch_stats": tpl["batch_stats"],
               "opt_state": tpl["opt_state"]}
        got = self._restore_sections(path, sub, partial=True)
        return template.replace(
            params=got["params"], batch_stats=got["batch_stats"],
            opt_state=got["opt_state"],
            teacher_params=_copy(got["params"]),
            teacher_batch_stats=_copy(got["batch_stats"]))


def best_model_path(snapshot_dir: str, model_name: str) -> str:
    return os.path.join(snapshot_dir, f"{model_name}_best_model")


def scan_best_dice(snapshot_dir: str) -> float:
    """Best validation dice already achieved in a stage directory, parsed
    from the ``iter_{i}_dice_{d}`` snapshot names.

    Used when resuming so a restarted stage cannot re-save
    ``{model}_best_model`` over a better historical checkpoint (the
    reference has no resume at all; a naive ``best = 0`` reset would
    regress the best-model selection rule of `LA_BCP_train.py:176-184`).
    """
    best = 0.0
    if not os.path.isdir(snapshot_dir):
        return best
    for name in os.listdir(snapshot_dir):
        if not name.startswith("iter_") or "_dice_" not in name:
            continue
        try:
            best = max(best, float(name.rsplit("_dice_", 1)[1]))
        except ValueError:
            continue
    return best
