"""LA offline evaluation CLI — mirrors `code/test_LA.py`.

Per-case (dice, jaccard, hd95, asd) lines, the dataset average, and
`performance.txt`, with optional largest-CC NMS — `test_all_case`
(`utils/test_3d_patch.py:41-79`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from bcp_tpu.cli.common import (eval_mesh, load_eval_variables,
                                 replicate_variables, snapshot_dir)
from bcp_tpu.config import la_config
from bcp_tpu.data.datasets import LAHeartDataset
from bcp_tpu.data.preprocess import write_nifti
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
    # `test_all_case(save_result=..)` (`utils/test_3d_patch.py:67-72`):
    # per-case float32 NIfTI dumps under <model>_predictions/
    p.add_argument("--save_result", type=int, default=0)
    p.add_argument("--labelnum", type=int, default=4)
    p.add_argument("--stage_name", type=str, default="self_train")
    # evaluate a reference-trained torch .pth directly (converted via
    # bcp_tpu.convert.load_torch_checkpoint; overrides --snapshot_root)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--stride_xy", type=int, default=18)
    p.add_argument("--stride_z", type=int, default=4)
    p.add_argument("--eval_batch", type=int, default=8)
    # shard window batches over a device mesh (-1 = all chips)
    p.add_argument("--num_devices", type=int, default=1)
    # the reference hardcodes (112,112,80) (`test_LA.py:15`); exposed for
    # non-standard volumes / smoke runs
    p.add_argument("--patch_size", type=int, nargs=3,
                   default=[112, 112, 80])
    # first-stage width of the trained checkpoint (reference: 16)
    p.add_argument("--n_filters", type=int, default=None)
    return p


def test_calculate_metric(args):
    cfg = la_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        snapshot_root=args.snapshot_root, stride_xy=args.stride_xy,
        stride_z=args.stride_z, eval_batch=args.eval_batch,
        patch_size=tuple(args.patch_size), n_filters=args.n_filters)
    snap = snapshot_dir(cfg, args.stage_name)
    ckpt = best_model_path(snap, cfg.net_type)
    model, variables = load_eval_variables(cfg, ckpt, torch_ckpt=args.torch_ckpt)
    print(f"init weight from {args.torch_ckpt or ckpt}")

    mesh = eval_mesh(args.num_devices)
    if mesh is not None:
        variables = replicate_variables(variables, mesh)
    evaluator = SlidingWindowEvaluator(
        model, cfg.patch_size, cfg.num_classes, cfg.stride_xy,
        cfg.stride_z, batch=cfg.eval_batch, mesh=mesh)
    ds = LAHeartDataset(cfg.root_path, "test")

    out_dir = snapshot_dir(cfg, f"{cfg.net_type}_predictions")
    os.makedirs(out_dir, exist_ok=True)
    total = np.zeros(4)

    # pipelined: volume ith+1..ith+3 compute on device while the host
    # runs NMS + medpy metrics + NIfTI writes for volume ith
    loaded = []

    def _images():
        for ith in range(len(ds)):
            case = ds.load(ith)
            loaded.append(case)
            yield case[0]

    for ith, pred in enumerate(
            evaluator.infer_cases(variables, _images(),
                                  rule=cfg.eval_rule)):
        image, label = loaded[ith]
        if args.nms:
            pred = host_largest_cc(pred)
        if pred.sum() == 0:
            m = (0.0, 0.0, 0.0, 0.0)
        else:
            m = calculate_metric_percase(pred, label)
        if args.detail:
            print("%02d,\t%.5f, %.5f, %.5f, %.5f" % (ith, *m))
        if args.save_result:
            # `%02d_{pred,img,gt}.nii.gz`, float32, identity affine —
            # `utils/test_3d_patch.py:67-72`
            for tag, vol in (("pred", pred), ("img", image), ("gt", label)):
                write_nifti(os.path.join(out_dir, "%02d_%s.nii.gz"
                                         % (ith, tag)),
                            np.asarray(vol).astype(np.float32))
        total += np.asarray(m)
    avg = total / len(ds)
    print(f"average metric is {avg}")
    with open(os.path.join(out_dir, "..", "performance.txt"), "w") as f:
        f.write(f"average metric is {avg} \n")
    return avg


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(test_calculate_metric(args))


if __name__ == "__main__":
    main()
