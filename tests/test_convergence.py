"""Convergence gates (VERDICT r1 item 3): per variant, a short synthetic
training run must *learn* — val Dice >= 0.6 and above the random-init
score. This is the regression that breaks if any loss / EMA /
pseudo-label / mixing piece goes silently wrong; the reference's only
integration check is the same rising-`dice_sample` signal
(`LA_BCP_train.py:173-187`).

4-filter models + small volumes keep wall-clock sane; marked `slow` so the
fast suite can skip them (`-m "not slow"`).
"""

import jax
import numpy as np
import pytest

from bcp_tpu.config import acdc_config, la_config, pancreas_config
from bcp_tpu.data import feed, synthetic
from bcp_tpu.train.state import build_optimizer, init_state
from bcp_tpu.train.trainer import BCPTrainer

pytestmark = pytest.mark.slow


def _init_dice(trainer, cfg):
    tx = build_optimizer(cfg, "pre")
    state0 = init_state(trainer.model, cfg, jax.random.PRNGKey(123), tx)
    return trainer.validate(state0)


def test_la_converges(tmp_path_factory):
    root = synthetic.make_la_dataset(
        str(tmp_path_factory.mktemp("la_conv")), n_train=8, n_test=2,
        shape=(40, 40, 24), seed=3)
    cfg = la_config(labelnum=4).replace(
        root_path=root, patch_size=(32, 32, 16), n_filters=4,
        compute_dtype="float32",
        batch_size=8, labeled_bs=4, max_samples=8,
        pre_iterations=90, self_iterations=45, eval_every=45,
        stride_xy=16, stride_z=8, eval_batch=4,
        snapshot_root=str(tmp_path_factory.mktemp("la_conv_snap")))
    trainer = BCPTrainer(cfg)
    d0 = _init_dice(trainer, cfg)
    pre_dice, _ = trainer.pretrain()
    assert pre_dice > d0, f"pre-train did not improve over init ({d0})"
    assert pre_dice >= 0.6, f"pre-train dice {pre_dice} below gate"
    self_dice, _ = trainer.selftrain()
    assert self_dice >= 0.6, f"self-train dice {self_dice} below gate"


def test_acdc_converges(tmp_path_factory):
    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_conv")), n_train_slices=16,
        n_val=2, slice_shape=(32, 32), seed=4)
    feed.ACDC_PATIENTS_TO_SLICES[1] = 8
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        compute_dtype="float32",
        pre_iterations=150, self_iterations=80, eval_every=75,
        snapshot_root=str(tmp_path_factory.mktemp("acdc_conv_snap")))
    trainer = BCPTrainer(cfg)
    d0 = _init_dice(trainer, cfg)
    pre_dice, _ = trainer.pretrain()
    assert pre_dice > d0
    assert pre_dice >= 0.6, f"pre-train dice {pre_dice} below gate"
    self_dice, _ = trainer.selftrain()
    assert self_dice >= 0.6, f"self-train dice {self_dice} below gate"


def test_pancreas_converges(tmp_path_factory):
    root = synthetic.make_pancreas_dataset(
        str(tmp_path_factory.mktemp("panc_conv")), n_lab=4, n_unlab=6,
        n_test=2, shape=(40, 40, 28), seed=5)
    cfg = pancreas_config().replace(
        root_path=root, patch_size=(32, 32, 16), mask_patch=16,
        n_filters=4, compute_dtype="float32", batch_size=8, labeled_bs=4,
        labeled_oversample=2,
        pre_iterations=100, self_iterations=50, eval_every=50,
        stride_xy=16, stride_z=8, eval_batch=4,
        snapshot_root=str(tmp_path_factory.mktemp("panc_conv_snap")))
    trainer = BCPTrainer(cfg)
    d0 = _init_dice(trainer, cfg)
    pre_dice, _ = trainer.pretrain()
    assert pre_dice > d0
    assert pre_dice >= 0.6, f"pre-train dice {pre_dice} below gate"
    self_dice, _ = trainer.selftrain()
    assert self_dice >= 0.6, f"self-train dice {self_dice} below gate"


def test_train_dice_metric_rises(tmp_path_factory):
    """The pancreas online train-dice meter (`CutPreMeasures`,
    `pancreas_utils.py:122-150`) must track learning: the step metric
    rises over a short pre-train."""
    import numpy as np
    from bcp_tpu.data.feed import BCPBatchFeeder
    from bcp_tpu.train.steps import make_pretrain_step

    root = synthetic.make_pancreas_dataset(
        str(tmp_path_factory.mktemp("panc_meter")), n_lab=4, n_unlab=4,
        n_test=1, shape=(36, 36, 28), seed=6)
    cfg = pancreas_config().replace(
        root_path=root, patch_size=(32, 32, 16), mask_patch=16,
        n_filters=4, compute_dtype="float32", batch_size=8, labeled_bs=4,
        labeled_oversample=2)
    from bcp_tpu.models import create_model
    model = create_model(cfg.net_type, cfg.num_classes, n_filters=4)
    tx = build_optimizer(cfg, "pre")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    step = make_pretrain_step(model, tx, cfg)
    feeder = BCPBatchFeeder(cfg, "pre")
    first, last = None, None
    for it in range(1, 81):
        state, metrics = step(state, next(feeder),
                              jax.random.fold_in(jax.random.PRNGKey(1), it))
        if it == 1:
            first = float(metrics["train_dice"])
        last = float(metrics["train_dice"])
    feeder.close()
    assert "train_dice" in metrics
    assert last > max(first, 0.5)
