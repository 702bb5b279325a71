"""End-to-end smoke: two-stage training on synthetic LA data, checkpoint
hand-off, resume, and validation improving over random init."""

import os

import numpy as np
import pytest

from bcp_tpu.config import la_config
from bcp_tpu.data import synthetic
from bcp_tpu.train.trainer import BCPTrainer


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = synthetic.make_la_dataset(
        str(tmp_path_factory.mktemp("la_data")), n_train=6, n_test=2,
        shape=(40, 40, 32), seed=0)
    return la_config(labelnum=4).replace(
        root_path=root, patch_size=(32, 32, 16), batch_size=6,
        labeled_bs=4, max_samples=6,
        pre_iterations=6, self_iterations=6, eval_every=3,
        stride_xy=12, stride_z=8, eval_batch=4,
        snapshot_root=str(tmp_path_factory.mktemp("snap")))


def test_two_stage_training_runs(tiny_cfg):
    trainer = BCPTrainer(tiny_cfg)
    pre_dice, pre_best = trainer.pretrain()
    assert os.path.exists(pre_best)
    assert 0.0 <= pre_dice <= 1.0
    self_dice, self_best = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0
    # logs written per stage
    assert os.path.exists(os.path.join(trainer.pre_dir, "log.txt"))
    assert os.path.exists(os.path.join(trainer.self_dir, "log.txt"))


def test_resume_from_last(tiny_cfg):
    cfg = tiny_cfg.replace(pre_iterations=4, eval_every=2)
    trainer = BCPTrainer(cfg, snapshot_root=os.path.join(
        cfg.snapshot_root, "resume_run"))
    trainer.pretrain()
    # resume: should be a no-op extension (start=4 == max) and not crash
    dice, _ = trainer.pretrain(resume=True)
    assert 0.0 <= dice <= 1.0


def test_short_stage_still_saves_best(tiny_cfg, tmp_path):
    """A stage shorter than eval_every must still leave a best checkpoint
    for the hand-off (the reference crashes in this case)."""
    cfg = tiny_cfg.replace(pre_iterations=1, self_iterations=1,
                           eval_every=100,
                           snapshot_root=str(tmp_path))
    trainer = BCPTrainer(cfg)
    pre_dice, pre_best = trainer.pretrain()
    assert os.path.exists(pre_best)
    self_dice, _ = trainer.selftrain()
    assert 0.0 <= self_dice <= 1.0
