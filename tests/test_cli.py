"""CLI smoke: parsers expose the reference flag surface with the
reference defaults; config plumbing is correct."""

import pytest

from bcp_tpu.cli import (test_acdc, test_la, test_pancreas, train_acdc,
                         train_la, train_pancreas)


def test_train_la_defaults():
    args = train_la.build_parser().parse_args([])
    # reference defaults — LA_BCP_train.py:32-55
    assert args.pre_max_iteration == 2000
    assert args.self_max_iteration == 15000
    assert args.batch_size == 8 and args.labeled_bs == 4
    assert args.base_lr == 0.01 and args.seed == 1337
    assert args.labelnum == 8
    assert args.u_weight == 0.5
    assert abs(args.mask_ratio - 2 / 3) < 1e-9


def test_train_acdc_defaults():
    args = train_acdc.build_parser().parse_args([])
    # ACDC_BCP_train.py:33-56
    assert args.pre_iterations == 10000 and args.max_iterations == 30000
    assert args.batch_size == 24 and args.labeled_bs == 12
    assert args.num_classes == 4 and args.labelnum == 7


def test_train_pancreas_defaults():
    args = train_pancreas.build_parser().parse_args([])
    # pancreas/train_pancreas.py:22-48
    assert args.label_percent == 20 and args.batch_size == 2
    assert args.lr == 1e-3 and args.seed == 2020
    assert args.pretraining_epochs == 60
    assert args.self_training_epochs == 200


def test_test_la_defaults():
    args = test_la.build_parser().parse_args([])
    # test_LA.py:9-19
    assert args.labelnum == 4 and args.nms == 1 and args.detail == 1
    assert args.stage_name == "self_train"
    assert args.stride_xy == 18 and args.stride_z == 4


def test_test_acdc_defaults():
    args = test_acdc.build_parser().parse_args([])
    # test_ACDC.py:17-23
    assert args.labelnum == 3 and args.num_classes == 4


def test_test_pancreas_defaults():
    args = test_pancreas.build_parser().parse_args([])
    # train_pancreas.py:185 final-test strides
    assert args.stride_xy == 16 and args.stride_z == 4


def test_config_plumbing_la():
    from bcp_tpu.config import la_config
    cfg = la_config(labelnum=4).replace(batch_size=6, labeled_bs=4)
    assert cfg.labeled_sub_bs == 2
    assert cfg.unlabeled_bs == 2
    assert cfg.unlabeled_sub_bs == 1
