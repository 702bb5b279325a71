"""LA offline evaluation CLI — mirrors `code/test_LA.py`.

Per-case (dice, jaccard, hd95, asd) lines, the dataset average, and
`performance.txt`, with optional largest-CC NMS — `test_all_case`
(`utils/test_3d_patch.py:41-79`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from bcp_tpu.cli.common import load_eval_variables, snapshot_dir
from bcp_tpu.config import la_config
from bcp_tpu.data.datasets import LAHeartDataset
from bcp_tpu.eval.metrics import calculate_metric_percase, host_largest_cc
from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
from bcp_tpu.train.checkpoints import best_model_path


def build_parser():
    p = argparse.ArgumentParser(description="LA BCP evaluation (TPU)")
    p.add_argument("--root_path", type=str, default="./data/LA")
    p.add_argument("--exp", type=str, default="BCP")
    p.add_argument("--model", type=str, default="VNet")
    p.add_argument("--detail", type=int, default=1)
    p.add_argument("--nms", type=int, default=1)
    p.add_argument("--labelnum", type=int, default=4)
    p.add_argument("--stage_name", type=str, default="self_train")
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--stride_xy", type=int, default=18)
    p.add_argument("--stride_z", type=int, default=4)
    p.add_argument("--eval_batch", type=int, default=8)
    return p


def test_calculate_metric(args):
    cfg = la_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        snapshot_root=args.snapshot_root, stride_xy=args.stride_xy,
        stride_z=args.stride_z, eval_batch=args.eval_batch)
    snap = snapshot_dir(cfg, args.stage_name)
    ckpt = best_model_path(snap, cfg.net_type)
    model, variables = load_eval_variables(cfg, ckpt)
    print(f"init weight from {ckpt}")

    evaluator = SlidingWindowEvaluator(
        model, cfg.patch_size, cfg.num_classes, cfg.stride_xy,
        cfg.stride_z, batch=cfg.eval_batch)
    ds = LAHeartDataset(cfg.root_path, "test")

    total = np.zeros(4)
    for ith in range(len(ds)):
        image, label = ds.load(ith)
        pred, _ = evaluator.infer(variables, image, rule=cfg.eval_rule,
                                  return_score=False)
        if args.nms:
            pred = host_largest_cc(pred)
        if pred.sum() == 0:
            m = (0.0, 0.0, 0.0, 0.0)
        else:
            m = calculate_metric_percase(pred, label)
        if args.detail:
            print("%02d,\t%.5f, %.5f, %.5f, %.5f" % (ith, *m))
        total += np.asarray(m)
    avg = total / len(ds)
    print(f"average metric is {avg}")
    out_dir = snapshot_dir(cfg, f"{cfg.net_type}_predictions")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "..", "performance.txt"), "w") as f:
        f.write(f"average metric is {avg} \n")
    return avg


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(test_calculate_metric(args))


if __name__ == "__main__":
    main()
