"""LA two-stage BCP training CLI — flags mirror `code/LA_BCP_train.py:32-55`."""

from __future__ import annotations

import argparse

from bcp_tpu.config import la_config
from bcp_tpu.train.trainer import BCPTrainer


def build_parser():
    p = argparse.ArgumentParser(description="LA BCP training (TPU)")
    p.add_argument("--root_path", type=str, default="./data/LA")
    p.add_argument("--exp", type=str, default="BCP")
    p.add_argument("--model", type=str, default="VNet")
    p.add_argument("--pre_max_iteration", type=int, default=2000)
    p.add_argument("--self_max_iteration", type=int, default=15000)
    p.add_argument("--max_samples", type=int, default=80)
    p.add_argument("--labeled_bs", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--labelnum", type=int, default=8)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--consistency", type=float, default=1.0)
    p.add_argument("--consistency_rampup", type=float, default=40.0)
    p.add_argument("--u_weight", type=float, default=0.5)
    p.add_argument("--mask_ratio", type=float, default=2 / 3)
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--stage", type=str, default="both",
                   choices=["both", "pre", "self"])
    p.add_argument("--resume", action="store_true")
    # data-parallel device mesh: 1 = single chip, -1 = every visible chip
    p.add_argument("--num_devices", type=int, default=1)
    p.add_argument("--sp_devices", type=int, default=1,
                   help="shard volumes' leading spatial axis over this "
                        "many of the num_devices chips (XLA halo exchange)")
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialise V-Net stage activations in the "
                        "backward (1/3 the activation HBM, bit-identical)")
    # HBM-resident dataset + on-device augmentation (single-chip only;
    # measured 317 vs 515 ms/iter wall-clock on v5e at LA shapes)
    p.add_argument("--device_data_cache", type=int, default=1)
    # fuse K steps into one XLA dispatch (numerically identical; see
    # Config.steps_per_dispatch). Requires eval_every % K == 0.
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # resolve -1 ("all chips") before gating the cache: on a 1-chip host
    # --num_devices -1 still trains single-device, where the HBM cache
    # is valid and worth ~60% step time
    import jax
    resolved_devices = (jax.device_count() if args.num_devices == -1
                        else args.num_devices)
    cfg = la_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        pre_iterations=args.pre_max_iteration,
        self_iterations=args.self_max_iteration,
        max_samples=args.max_samples, labeled_bs=args.labeled_bs,
        batch_size=args.batch_size, base_lr=args.base_lr, seed=args.seed,
        consistency=args.consistency,
        consistency_rampup=args.consistency_rampup,
        u_weight=args.u_weight, mask_ratio=args.mask_ratio,
        snapshot_root=args.snapshot_root,
        compute_dtype=args.compute_dtype,
        num_devices=args.num_devices,
        sp_devices=args.sp_devices,
        remat=bool(args.remat),
        device_data_cache=bool(args.device_data_cache)
        and resolved_devices == 1,
        steps_per_dispatch=args.steps_per_dispatch)
    trainer = BCPTrainer(cfg)
    print("Starting BCP training.")
    if args.stage in ("both", "pre"):
        trainer.pretrain(resume=args.resume)
    if args.stage in ("both", "self"):
        trainer.selftrain(resume=args.resume)


if __name__ == "__main__":
    main()
