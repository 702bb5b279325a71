"""End-to-end smoke for the ACDC (2D) and pancreas (3D instancenorm)
trainer variants on synthetic data.

The steps_per_dispatch=2 tests copy the base tests' snapshot trees and
run only the self-train stage on top of them (round-4 suite-time pass:
the K=2 *pre* stage adds no coverage beyond the base pre stage plus the
K-fused self stage, and `test_steps.py::test_steps_per_dispatch_identical*`
already pins K-fused exactness per stage).
"""

import os
import shutil

import pytest

from bcp_tpu.config import acdc_config, pancreas_config
from bcp_tpu.data import synthetic
from bcp_tpu.data import feed
from bcp_tpu.train.trainer import BCPTrainer


@pytest.fixture(scope="module")
def acdc_run(tmp_path_factory):
    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_data")), n_train_slices=16,
        n_val=2, slice_shape=(32, 32))
    feed.ACDC_PATIENTS_TO_SLICES[1] = 8
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        n_filters=4,
        pre_iterations=4, self_iterations=4, eval_every=2,
        snapshot_root=str(tmp_path_factory.mktemp("acdc_snap")))
    trainer = BCPTrainer(cfg)
    pre = trainer.pretrain()
    self_ = trainer.selftrain()
    return cfg, pre, self_


@pytest.fixture(scope="module")
def pancreas_run(tmp_path_factory):
    root = synthetic.make_pancreas_dataset(
        str(tmp_path_factory.mktemp("panc_data")), n_lab=4, n_unlab=6,
        n_test=2, shape=(40, 40, 40))
    cfg = pancreas_config().replace(
        root_path=root, patch_size=(32, 32, 32), mask_patch=16,
        batch_size=8, labeled_bs=4, labeled_oversample=2, n_filters=4,
        pre_iterations=3, self_iterations=3, eval_every=3,
        stride_xy=16, stride_z=16, eval_batch=4,
        snapshot_root=str(tmp_path_factory.mktemp("panc_snap")))
    trainer = BCPTrainer(cfg)
    pre = trainer.pretrain()
    self_ = trainer.selftrain()
    return cfg, pre, self_


def test_acdc_two_stage(acdc_run):
    _, (pre_dice, pre_best), (self_dice, _) = acdc_run
    assert os.path.exists(pre_best)
    assert 0.0 <= pre_dice <= 1.0
    assert 0.0 <= self_dice <= 1.0


def test_pancreas_two_stage(pancreas_run):
    _, (pre_dice, _), (self_dice, _) = pancreas_run
    assert 0.0 <= pre_dice <= 1.0
    assert 0.0 <= self_dice <= 1.0


def test_acdc_steps_per_dispatch(acdc_run, tmp_path):
    """steps_per_dispatch > 1 on the ACDC *device-cached* feed (the
    round-5 newly-legal combination): K=2 fused dispatch through the
    self stage, incl. the stacked ulab_* snapshot side-channels."""
    cfg = acdc_run[0]
    root = str(tmp_path / "snap")
    shutil.copytree(cfg.snapshot_root, root)
    # wipe the copied self stage so K=2 re-runs it from the pre hand-off
    run = f"{cfg.name}_{cfg.exp}_{cfg.labelnum}_labeled"
    shutil.rmtree(os.path.join(root, run, "self_train"))
    cfg2 = cfg.replace(steps_per_dispatch=2, device_data_cache=True)
    trainer = BCPTrainer(cfg2, snapshot_root=root)
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0
    assert os.path.exists(os.path.join(root, run, "self_train", "log.txt"))


def test_pancreas_steps_per_dispatch(pancreas_run, tmp_path):
    """K=2 fused dispatch on the pancreas *device-cached* feed (the
    round-5 newly-legal combination), with the epoch meters consuming
    the leading-stacked metrics per sub-step."""
    cfg = pancreas_run[0]
    root = str(tmp_path / "snap")
    shutil.copytree(cfg.snapshot_root, root)
    run = f"{cfg.name}_{cfg.exp}_{cfg.labelnum}_labeled"
    shutil.rmtree(os.path.join(root, run, "self_train"))
    # stage length and eval cadence must be K-multiples
    cfg2 = cfg.replace(steps_per_dispatch=2, self_iterations=4,
                       eval_every=2, device_data_cache=True)
    trainer = BCPTrainer(cfg2, snapshot_root=root)
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0
    assert os.path.exists(os.path.join(root, run, "self_train", "log.txt"))
