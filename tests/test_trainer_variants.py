"""End-to-end smoke for the ACDC (2D) and pancreas (3D instancenorm)
trainer variants on synthetic data."""

import os

import pytest

from bcp_tpu.config import acdc_config, pancreas_config
from bcp_tpu.data import synthetic
from bcp_tpu.data import feed
from bcp_tpu.train.trainer import BCPTrainer


def test_acdc_two_stage(tmp_path_factory):
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
    pre_dice, pre_best = trainer.pretrain()
    assert os.path.exists(pre_best)
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0


def test_pancreas_two_stage(tmp_path_factory):
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
    pre_dice, _ = trainer.pretrain()
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= pre_dice <= 1.0
    assert 0.0 <= self_dice <= 1.0


def test_acdc_steps_per_dispatch(tmp_path_factory):
    """steps_per_dispatch > 1 on the ACDC host feed: K=2 fused dispatch
    through both stages (the stacked host path shards nothing here —
    single device — and the stage lengths are K-multiples)."""
    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_k_data")), n_train_slices=16,
        n_val=1, slice_shape=(32, 32))
    feed.ACDC_PATIENTS_TO_SLICES[1] = 8
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        n_filters=4, steps_per_dispatch=2,
        pre_iterations=4, self_iterations=4, eval_every=2,
        snapshot_root=str(tmp_path_factory.mktemp("acdc_k_snap")))
    trainer = BCPTrainer(cfg)
    pre_dice, pre_best = trainer.pretrain()
    assert os.path.exists(pre_best)
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0


def test_pancreas_steps_per_dispatch(tmp_path_factory):
    """K=2 fused dispatch on the pancreas host feed, with the epoch
    meters consuming the leading-stacked metrics per sub-step."""
    # same shapes/config as test_pancreas_two_stage so every program
    # except the K=2 train steps dedupes in the persistent compile
    # cache (round-4 suite-time pass); non-cubic eval volumes are
    # covered by test_eval.py
    root = synthetic.make_pancreas_dataset(
        str(tmp_path_factory.mktemp("panc_k_data")), n_lab=4, n_unlab=4,
        n_test=1, shape=(40, 40, 40))
    cfg = pancreas_config().replace(
        root_path=root, patch_size=(32, 32, 32), mask_patch=16,
        n_filters=4, batch_size=8, labeled_bs=4, labeled_oversample=2,
        steps_per_dispatch=2,
        pre_iterations=4, self_iterations=4, eval_every=2,
        stride_xy=16, stride_z=16, eval_batch=4,
        snapshot_root=str(tmp_path_factory.mktemp("panc_k_snap")))
    trainer = BCPTrainer(cfg)
    pre_dice, pre_best = trainer.pretrain()
    assert os.path.exists(pre_best)
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0
