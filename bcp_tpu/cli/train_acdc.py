"""ACDC two-stage BCP training CLI — flags mirror
`code/ACDC_BCP_train.py:33-56`."""

from __future__ import annotations

import argparse

from bcp_tpu.config import acdc_config
from bcp_tpu.train.trainer import BCPTrainer


def build_parser():
    p = argparse.ArgumentParser(description="ACDC BCP training (TPU)")
    p.add_argument("--root_path", type=str, default="./data/ACDC")
    p.add_argument("--exp", type=str, default="BCP")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--pre_iterations", type=int, default=10000)
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--labeled_bs", type=int, default=12)
    p.add_argument("--labelnum", type=int, default=7)
    p.add_argument("--u_weight", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--consistency", type=float, default=0.1)
    p.add_argument("--consistency_rampup", type=float, default=200.0)
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--stage", type=str, default="both",
                   choices=["both", "pre", "self"])
    p.add_argument("--resume", action="store_true")
    # data-parallel device mesh: 1 = single chip, -1 = every visible chip
    p.add_argument("--num_devices", type=int, default=1)
    # fuse K train steps into one XLA dispatch (single-device;
    # Config.steps_per_dispatch). Requires eval_every % K == 0.
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    p.add_argument("--sp_devices", type=int, default=1,
                   help="shard volumes' leading spatial axis over this "
                        "many of the num_devices chips (XLA halo exchange)")
    # HBM-resident slices + on-device RandomGenerator augmentation
    # (single-chip only; also avoids the tunneled runtime's host
    # transfer-buffer leak on the ~6 MB/step batch uploads)
    p.add_argument("--device_data_cache", type=int, default=1)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    resolved_devices = (jax.device_count() if args.num_devices == -1
                        else args.num_devices)
    cfg = acdc_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        pre_iterations=args.pre_iterations,
        self_iterations=args.max_iterations,
        batch_size=args.batch_size, labeled_bs=args.labeled_bs,
        base_lr=args.base_lr, num_classes=args.num_classes,
        seed=args.seed, u_weight=args.u_weight,
        consistency=args.consistency,
        consistency_rampup=args.consistency_rampup,
        snapshot_root=args.snapshot_root,
        compute_dtype=args.compute_dtype,
        num_devices=args.num_devices,
        sp_devices=args.sp_devices,
        device_data_cache=bool(args.device_data_cache)
        and resolved_devices == 1,
        steps_per_dispatch=args.steps_per_dispatch)
    trainer = BCPTrainer(cfg)
    if args.stage in ("both", "pre"):
        trainer.pretrain(resume=args.resume)
    if args.stage in ("both", "self"):
        trainer.selftrain(resume=args.resume)


if __name__ == "__main__":
    main()
