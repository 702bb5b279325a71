"""Pancreas offline evaluation — mirrors `test_model` + `test_calculate_metric`
(`pancreas/train_pancreas.py:181-187`, `pancreas/test_util.py:188-198`):
center-cropped 96^3 volumes, sliding window stride 16/4 at final test,
argmax labelling, (dice, jaccard, hd95, asd) means."""

from __future__ import annotations

import argparse
import os

import numpy as np

from bcp_tpu.cli.common import (eval_mesh, load_eval_variables,
                                 replicate_variables, snapshot_dir)
from bcp_tpu.config import pancreas_config
from bcp_tpu.data.datasets import PancreasDataset
from bcp_tpu.data.preprocess import write_nifti
from bcp_tpu.data.transforms import pancreas_test_transform
from bcp_tpu.eval.metrics import calculate_metric_percase
from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
from bcp_tpu.train.checkpoints import best_model_path


def build_parser():
    p = argparse.ArgumentParser(description="Pancreas BCP evaluation (TPU)")
    p.add_argument("--data_root", type=str, default="./data/pancreas")
    p.add_argument("--label_percent", type=int, default=20)
    p.add_argument("--stage_name", type=str, default="self_train")
    # evaluate a reference-trained torch .pth directly (converted via
    # bcp_tpu.convert.load_torch_checkpoint; overrides --snapshot_root)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--snapshot_root", type=str, default="./result/cutmix")
    p.add_argument("--stride_xy", type=int, default=16)
    p.add_argument("--stride_z", type=int, default=4)
    p.add_argument("--detail", type=int, default=1)
    # per-case float32 NIfTI dumps — `test_util.test_all_case(save_result)`
    # (`pancreas/test_util.py:115-121`)
    p.add_argument("--save_result", type=int, default=0)
    # shard window batches over a device mesh (-1 = all chips)
    p.add_argument("--num_devices", type=int, default=1)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = pancreas_config(label_percent=args.label_percent).replace(
        root_path=args.data_root, snapshot_root=args.snapshot_root,
        stride_xy=args.stride_xy, stride_z=args.stride_z)
    ckpt = best_model_path(snapshot_dir(cfg, args.stage_name), cfg.net_type)
    model, variables = load_eval_variables(cfg, ckpt, torch_ckpt=args.torch_ckpt)
    print(f"init weight from {args.torch_ckpt or ckpt}")

    mesh = eval_mesh(args.num_devices)
    if mesh is not None:
        variables = replicate_variables(variables, mesh)
    evaluator = SlidingWindowEvaluator(
        model, cfg.patch_size, cfg.num_classes, cfg.stride_xy,
        cfg.stride_z, batch=cfg.eval_batch, mesh=mesh)
    ds = PancreasDataset(cfg.root_path, "test")
    pred_dir = os.path.join(snapshot_dir(cfg, args.stage_name),
                            "predictions")
    os.makedirs(pred_dir, exist_ok=True)
    total = np.zeros(4)

    # pipelined: the host's center-crop transform + medpy metrics for
    # volume i overlap device compute of volumes i+1..i+3
    loaded = []

    def _images():
        for idx in range(len(ds)):
            img, lab = pancreas_test_transform(*ds.load(idx),
                                               cfg.patch_size)
            loaded.append((img, lab))
            yield img

    for i, pred in enumerate(
            evaluator.infer_cases(variables, _images(), rule="argmax")):
        image, label = loaded[i]
        m = ((0.0, 0.0, 0.0, 0.0) if pred.sum() == 0
             else calculate_metric_percase(pred, label))
        if args.detail:
            print("%02d,\t%.5f, %.5f, %.5f, %.5f" % (i, *m))
        if args.save_result:
            for tag, vol in (("pred", pred), ("img", image), ("gt", label)):
                write_nifti(os.path.join(pred_dir, "%02d_%s.nii.gz"
                                         % (i, tag)),
                            np.asarray(vol).astype(np.float32))
        total += np.asarray(m)
    avg = total / len(ds)
    print(f"average metric is {avg}")
    return avg


if __name__ == "__main__":
    main()
