"""Experiment configuration tree + the three reference presets.

Replaces the reference's per-script argparse blobs and module globals
(`LA_BCP_train.py:32-55`, `ACDC_BCP_train.py:33-56`,
`pancreas/train_pancreas.py:22-48`) with one dataclass; flag names are kept
where sensible so reference users can map 1:1. Hyperparameter values follow
SURVEY.md §2's behavioural-spec table.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    # ---- identity
    name: str = "LA"                    # experiment family
    exp: str = "BCP"                    # run tag (reference --exp)
    variant: str = "la"                 # 'la' | 'acdc' | 'pancreas' wiring
    seed: int = 1337

    # ---- model
    net_type: str = "VNet"              # factory key
    num_classes: int = 2
    in_channels: int = 1
    dims: int = 3
    # width of the first conv stage (reference V-Net: 16). None = model
    # default; small values make cheap CI fixtures.
    n_filters: Optional[int] = None
    # Mixed precision: bf16 convs/norms on the MXU, float32 params,
    # losses and logits. 'float32' for bitwise-conservative runs.
    compute_dtype: str = "bfloat16"
    # Fuse the two mixed sub-batches (teacher and student) into single
    # concat forwards with 2-group BatchNorm — numerically identical to
    # the reference's separate forwards (see layers.TorchBatchNorm) and
    # ~18% faster per step (291ms vs 344ms on v5e at LA shapes). Costs a
    # longer first compile (~3 min, cached thereafter).
    fuse_subbatches: bool = True

    # ---- data
    root_path: str = "./data/LA"
    patch_size: Tuple[int, ...] = (112, 112, 80)
    labelnum: int = 8                   # labeled volumes / patients
    max_samples: int = 80
    batch_size: int = 8
    labeled_bs: int = 4
    labeled_oversample: int = 1         # pancreas: x5 (20%) / x10 (10%)
    # Keep the training volumes resident in HBM and run crop/rot/flip
    # augmentation on device (LA/pancreas; ~2-3GB at bf16). Removes the
    # per-step host->device batch upload entirely. Host feed remains the
    # default and is required for multi-device sharding.
    device_data_cache: bool = False

    # Fuse K consecutive train steps into ONE XLA program (lax.scan over
    # leading-stacked batches): numerically identical to K dispatches
    # (same per-step fold_in keys, batch stream and BN/EMA threading) but
    # amortises the per-dispatch host/tunnel round-trips — on the
    # tunneled v5e the K=1 loop exposes ~17 ms dispatch + fetch latency
    # per iteration. Works with every variant's feed (device-cached or
    # host) and under a data/space mesh (the stacked host batches keep
    # the batch axis sharded; GSPMD scans over the leading K axis);
    # eval_every and the stage lengths must be multiples of K.
    steps_per_dispatch: int = 1

    # ---- parallelism (SURVEY.md C28/C29): data-parallel 1-D device mesh.
    # The per-device batch stays the reference's `batch_size`; the global
    # batch and the labeled/unlabeled stream widths scale by num_devices
    # (parallel/mesh.py). 1 = single device; -1 = every visible device.
    num_devices: int = 1
    # Spatial partitioning: shard every volume's leading spatial axis
    # over a second 'space' mesh axis of this size (must divide
    # num_devices and the patch's x extent). XLA SPMD inserts the conv
    # halo exchanges and psums the BN statistics — use when one chip's
    # HBM can't hold the activations of a large patch. The global batch
    # scales by num_devices // sp_devices only.
    sp_devices: int = 1
    # Rematerialise V-Net stage activations in the backward
    # (jax.checkpoint per stage; bit-identical grads, tested): ~1/3 the
    # activation HBM for ~1 extra forward of FLOPs — for patches/batches
    # that otherwise OOM one chip. 3-D V-Net pipelines only.
    remat: bool = False

    # ---- optimisation
    optimizer: str = "sgd"              # 'sgd' | 'adam'
    base_lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # LA self-train: lr = base * 0.1 ** (step // lr_decay_every)
    # (`LA_BCP_train.py:273-276`); None = constant.
    lr_decay_every: Optional[int] = None

    # ---- schedule
    pre_iterations: int = 2000
    self_iterations: int = 15000
    eval_every: int = 200
    # Overlap validation + checkpoint writes with training: each eval
    # boundary snapshots the state (an on-device copy — training's
    # donated buffers never alias it) and a single background worker
    # validates/saves it while the train loop keeps dispatching steps.
    # Jobs run strictly in submission order, so the states validated,
    # the best-dice comparison sequence and the checkpoints written are
    # identical to the serialized loop (tested); only the pause
    # disappears (43%/22% of the r4 LA stage wall-clocks). False =
    # reference behaviour: the loop blocks through each validation
    # (`LA_BCP_train.py:173-187,278-292`).
    async_val: bool = True
    # Validation jobs allowed in flight before an eval boundary blocks
    # (each holds one on-device state snapshot of HBM). 1 serializes
    # consecutive sweeps; 2 keeps a fast stage (pre-train's 200-step
    # windows are shorter than one LA validation sweep) from exposing
    # the worker as the critical path. Job ORDER is depth-independent,
    # so the validated states / best-dice / checkpoint sequence is
    # unchanged.
    async_val_depth: int = 2
    # fetch+log step metrics every N steps. 1 = reference behaviour (logs
    # every iteration); each fetch synchronises with the device, so >1
    # lets consecutive steps pipeline (~10% faster on tunneled backends).
    log_every: int = 1

    # ---- debugging / observability (SURVEY.md §5: the reference has no
    # tracing or sanitizers; these are the TPU-native equivalents)
    debug_nans: bool = False            # jax debug_nans in the train step
    profile_dir: Optional[str] = None   # jax.profiler trace output dir
    profile_steps: Tuple[int, int] = (10, 20)  # [start, end) steps to trace

    # ---- BCP algorithm
    # 'ratio' = single cuboid/rect of int(dim*ratio) per dim (context_mask
    # / generate_mask); 'fixed' = mask_patch^N cube (pancreas);
    # 'grid' = per-cell multi-box (random_mask, `ACDC_BCP_train.py:142`);
    # 'slab' = full slab along one axis (concate/contact mask,
    # `BCP_utils.py:48`, `ACDC_BCP_train.py:156`)
    mask_kind: str = "ratio"
    mask_ratio: float = 2.0 / 3.0
    mask_patch: int = 64                # used when mask_kind == 'fixed'
    u_weight: float = 0.5
    ema_alpha: float = 0.99
    ema_full_state: bool = False        # ACDC EMAs BN buffers too
    load_opt_state: bool = False        # ACDC self-train restores optimizer
    nms: bool = True                    # LCC-clean teacher pseudo-labels
    cc_connectivity: Optional[int] = None   # None = full (skimage default)
    pseudo_label: str = "binary"        # 'binary' (thresh 0.5) | 'argmax'

    # ---- consistency ramp (computed + logged only; never applied to the
    # loss in the reference — see bcp_tpu.ops.ramps docstring)
    consistency: float = 1.0
    consistency_rampup: float = 40.0

    # ---- evaluation protocol
    stride_xy: int = 18
    stride_z: int = 4
    eval_rule: str = "threshold"        # 'threshold' (LA, class-1 prob>0.5,
    # `test_3d_patch.py:137`) | 'argmax' (pancreas, `test_util.py:146`)
    eval_batch: int = 16                # sliding windows per device batch

    # ---- output
    snapshot_root: str = "./model/BCP"

    @property
    def labeled_sub_bs(self) -> int:
        return self.labeled_bs // 2

    @property
    def unlabeled_bs(self) -> int:
        return self.batch_size - self.labeled_bs

    @property
    def unlabeled_sub_bs(self) -> int:
        return self.unlabeled_bs // 2

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def la_config(labelnum: int = 8, **kw) -> Config:
    """LA preset — `LA_BCP_train.py:32-55,115-116`."""
    return Config(
        name="LA", variant="la", seed=1337,
        net_type="VNet", num_classes=2, dims=3,
        root_path="./data/LA", patch_size=(112, 112, 80),
        labelnum=labelnum, max_samples=80, batch_size=8, labeled_bs=4,
        optimizer="sgd", base_lr=0.01, lr_decay_every=2500,
        pre_iterations=2000, self_iterations=15000,
        mask_kind="ratio", u_weight=0.5, ema_alpha=0.99,
        ema_full_state=False, load_opt_state=False,
        nms=True, cc_connectivity=None, pseudo_label="binary",
        stride_xy=18, stride_z=4,
        consistency=1.0, consistency_rampup=40.0,
    ).replace(**kw)


def acdc_config(labelnum: int = 7, **kw) -> Config:
    """ACDC preset — `ACDC_BCP_train.py:33-56`."""
    return Config(
        name="ACDC", variant="acdc", seed=1337,
        net_type="unet", num_classes=4, dims=2,
        root_path="./data/ACDC", patch_size=(256, 256),
        labelnum=labelnum, max_samples=0, batch_size=24, labeled_bs=12,
        optimizer="sgd", base_lr=0.01, lr_decay_every=None,
        pre_iterations=10000, self_iterations=30000,
        mask_kind="ratio", u_weight=0.5, ema_alpha=0.99,
        ema_full_state=True, load_opt_state=True,
        nms=True, cc_connectivity=None, pseudo_label="argmax",
        consistency=0.1, consistency_rampup=200.0,
    ).replace(**kw)


def pancreas_config(label_percent: int = 20, **kw) -> Config:
    """Pancreas preset — `pancreas/train_pancreas.py:22-48`.

    Epoch-based in the reference; expressed here in iterations:
    pretrain = 60 epochs x 30 steps (12 labeled x5 oversample / batch 2,
    zip of the a/b loaders), self-train = 200 epochs x 25 steps (zip of 4
    loaders truncates at the 50-unlabeled/batch-2 loaders). Eval every 20
    epochs, strides 18/4 during training (`test_util.py:188`), 16/4 at the
    final test (`train_pancreas.py:185`), argmax labelling. Note the
    reference *defines* u_weight=1.5 but never passes it to mix_loss
    (`train_pancreas.py:160-164` uses the 0.5 default).
    """
    return Config(
        name="pancreas", variant="pancreas", seed=2020,
        net_type="VNet_pancreas", num_classes=2, dims=3,
        root_path="./data/pancreas", patch_size=(96, 96, 96),
        labelnum=label_percent, max_samples=62, batch_size=8, labeled_bs=4,
        labeled_oversample=5 if label_percent == 20 else 10,
        optimizer="adam", base_lr=1e-3, weight_decay=0.0,
        pre_iterations=60 * 30, self_iterations=200 * 25,
        eval_every=20 * 25,
        mask_kind="fixed", mask_patch=64, u_weight=0.5, ema_alpha=0.99,
        ema_full_state=False, load_opt_state=True,
        nms=True, cc_connectivity=2, pseudo_label="binary",
        stride_xy=18, stride_z=4, eval_rule="argmax",
        consistency=0.1, consistency_rampup=40.0,
    ).replace(**kw)


PRESETS = {
    "LA": la_config,
    "ACDC": acdc_config,
    "pancreas": pancreas_config,
}
