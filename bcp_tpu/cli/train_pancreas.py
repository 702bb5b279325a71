"""Pancreas two-stage BCP training CLI — the reference uses module globals
(`code/pancreas/train_pancreas.py:22-48`); exposed here as flags."""

from __future__ import annotations

import argparse

from bcp_tpu.config import pancreas_config
from bcp_tpu.train.trainer import BCPTrainer


def build_parser():
    p = argparse.ArgumentParser(description="Pancreas BCP training (TPU)")
    p.add_argument("--data_root", type=str, default="./data/pancreas")
    p.add_argument("--label_percent", type=int, default=20,
                   choices=[10, 20])
    p.add_argument("--batch_size", type=int, default=2,
                   help="per-stream batch (reference batch_size=2)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--pretraining_epochs", type=int, default=60)
    p.add_argument("--self_training_epochs", type=int, default=200)
    p.add_argument("--seed", type=int, default=2020)
    p.add_argument("--snapshot_root", type=str, default="./result/cutmix")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--stage", type=str, default="both",
                   choices=["both", "pre", "self"])
    p.add_argument("--resume", action="store_true")
    # data-parallel device mesh: 1 = single chip, -1 = every visible chip
    # (the reference's nn.DataParallel over 2 GPUs,
    # `pancreas/dataloaders.py:12-19`)
    p.add_argument("--num_devices", type=int, default=1)
    # fuse K train steps into one XLA dispatch (single-device;
    # Config.steps_per_dispatch). Requires eval_every % K == 0.
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    p.add_argument("--sp_devices", type=int, default=1,
                   help="shard volumes' leading spatial axis over this "
                        "many of the num_devices chips (XLA halo exchange)")
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialise V-Net stage activations in the "
                        "backward (1/3 the activation HBM, bit-identical)")
    # HBM-resident volumes + on-device crop (single-chip only; also
    # avoids the tunneled runtime's host transfer-buffer leak on the
    # ~28 MB/step batch uploads)
    p.add_argument("--device_data_cache", type=int, default=1)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    resolved_devices = (jax.device_count() if args.num_devices == -1
                        else args.num_devices)
    cache = bool(args.device_data_cache) and resolved_devices == 1
    cfg = pancreas_config(label_percent=args.label_percent).replace(
        root_path=args.data_root, base_lr=args.lr, seed=args.seed,
        batch_size=4 * args.batch_size, labeled_bs=2 * args.batch_size,
        snapshot_root=args.snapshot_root,
        compute_dtype=args.compute_dtype,
        num_devices=args.num_devices,
        sp_devices=args.sp_devices,
        steps_per_dispatch=args.steps_per_dispatch,
        remat=bool(args.remat))
    # epoch -> iteration conversion happens against the actual list sizes
    trainer = BCPTrainer(cfg)
    from bcp_tpu.data.feed import BCPBatchFeeder
    # the counting feeders stay on the host feed (cfg's default) so they
    # don't build throwaway HBM stores just to read steps_per_epoch
    pre_feeder = BCPBatchFeeder(cfg, "pre", data_scale=trainer.data_scale)
    pre_iters = args.pretraining_epochs * pre_feeder.steps_per_epoch
    pre_feeder.close()
    self_feeder = BCPBatchFeeder(cfg, "self", data_scale=trainer.data_scale)
    self_iters = args.self_training_epochs * self_feeder.steps_per_epoch
    self_feeder.close()
    trainer.cfg = cfg.replace(pre_iterations=pre_iters,
                              self_iterations=self_iters,
                              device_data_cache=cache)
    if args.stage in ("both", "pre"):
        trainer.pretrain(resume=args.resume)
    if args.stage in ("both", "self"):
        trainer.selftrain(resume=args.resume)


if __name__ == "__main__":
    main()
