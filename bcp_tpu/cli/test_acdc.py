"""ACDC offline evaluation CLI — mirrors `code/test_ACDC.py`.

Per-class-per-volume (dice, jaccard, hd95, asd) averaged over the test
list, printed per class plus the 3-class mean, written to performance.txt
(`test_ACDC.py:82-125`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from bcp_tpu.cli.common import (eval_mesh, load_eval_variables,
                                 replicate_variables, snapshot_dir)
from bcp_tpu.config import acdc_config
from bcp_tpu.data.datasets import ACDCDataset
from bcp_tpu.data.preprocess import write_nifti
from bcp_tpu.eval.slice2d import Slice2DEvaluator
from bcp_tpu.train.checkpoints import best_model_path


def build_parser():
    p = argparse.ArgumentParser(description="ACDC BCP evaluation (TPU)")
    p.add_argument("--root_path", type=str, default="./data/ACDC")
    p.add_argument("--exp", type=str, default="BCP")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--labelnum", type=int, default=3)
    p.add_argument("--stage_name", type=str, default="self_train")
    # evaluate a reference-trained torch .pth directly (converted via
    # bcp_tpu.convert.load_torch_checkpoint; overrides --snapshot_root)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    # per-case float32 NIfTI dumps (spacing (1,1,10)) — the sitk writes of
    # `test_ACDC.py:70-78` (shipped commented-out there; live here)
    p.add_argument("--save_result", type=int, default=0)
    # shard slice batches over a device mesh (-1 = all chips)
    p.add_argument("--num_devices", type=int, default=1)
    return p


def inference(args):
    cfg = acdc_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        num_classes=args.num_classes, snapshot_root=args.snapshot_root)
    snap = snapshot_dir(cfg, args.stage_name)
    ckpt = best_model_path(snap, cfg.net_type)
    model, variables = load_eval_variables(cfg, ckpt, torch_ckpt=args.torch_ckpt)
    print(f"init weight from {args.torch_ckpt or ckpt}")

    mesh = eval_mesh(args.num_devices)
    if mesh is not None:
        variables = replicate_variables(variables, mesh)
    evaluator = Slice2DEvaluator(model, cfg.patch_size, cfg.num_classes,
                                 mesh=mesh)
    ds = ACDCDataset(cfg.root_path, "test")
    pred_dir = os.path.join(os.path.dirname(snap),
                            f"{args.model}_predictions")
    os.makedirs(pred_dir, exist_ok=True)
    totals = np.zeros((cfg.num_classes - 1, 4))

    # pipelined: device forwards of volumes i+1..i+3 run while the host
    # computes medpy metrics / writes NIfTIs for volume i
    loaded = []

    def _images():
        for idx in range(len(ds)):
            case = ds.load(idx)
            loaded.append(case)
            yield case[0]

    for i, pred in enumerate(
            evaluator.predict_volumes(variables, _images())):
        image, label = loaded[i]
        per_class = evaluator.metrics_for(pred, label)
        if args.save_result:
            case = ds.cases[i]
            for tag, vol in (("pred", pred), ("img", image),
                             ("gt", label)):
                write_nifti(os.path.join(pred_dir, f"{case}_{tag}.nii.gz"),
                            np.asarray(vol).astype(np.float32),
                            spacing=(1.0, 1.0, 10.0))
        totals += np.asarray(per_class)
    avg = totals / len(ds)
    return avg, snap


def main(argv=None):
    args = build_parser().parse_args(argv)
    avg, snap = inference(args)
    print([avg[c] for c in range(avg.shape[0])])
    print(avg.mean(axis=0))
    pred_dir = os.path.join(os.path.dirname(snap),
                            f"{args.model}_predictions")
    os.makedirs(pred_dir, exist_ok=True)
    with open(os.path.join(pred_dir, "..", "performance.txt"), "w") as f:
        f.write(f"metric is {avg} \n")
        f.write(f"average metric is {avg.mean(axis=0)}\n")


if __name__ == "__main__":
    main()
