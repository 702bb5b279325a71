"""Jitted train steps: the whole BCP update is one XLA program.

``make_pretrain_step`` compiles the labeled copy-paste pre-train update
(`LA_BCP_train.py:145-170`, `ACDC_BCP_train.py:237-255`,
`pancreas/train_pancreas.py:82-96`); ``make_selftrain_step`` compiles the
full mean-teacher self-train update (`LA_BCP_train.py:234-270`,
`ACDC_BCP_train.py:354-390`, `pancreas/train_pancreas.py:144-171`):
teacher pseudo-labelling (incl. on-device largest-CC NMS), cuboid mask
sampling, bidirectional mixing, two student forwards, masked Dice+CE,
optimizer update and the EMA teacher update — zero host round-trips per
iteration (the reference crosses to the CPU for NMS every step,
`LA_BCP_train.py:65-77`).

Batch layout (channels-last, labeled/unlabeled kept as separate arrays so
data-parallel sharding slices each stream evenly):

  pretrain:   {img_a, img_b: (sub,*S,C), lab_a, lab_b: (sub,*S)}
  self-train: + {uimg_a, uimg_b: (usub,*S,C)}

The reference's per-stream sub-batches come from static slices of one
concatenated batch (`LA_BCP_train.py:237-239`); splitting at the data layer
is equivalent and mesh-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from bcp_tpu.config import Config
from bcp_tpu.ops import cc, losses, masks
from bcp_tpu.ops.ema import ema_update
from bcp_tpu.train.state import TrainState


# --------------------------------------------------------------------------
# model application helpers

def _logits(out):
    """Models return (logits, features); losses use logits only."""
    return out[0] if isinstance(out, tuple) else out


def _apply_train(model, params, batch_stats, x, dropout_key):
    """Train-mode forward; returns (logits, new_batch_stats)."""
    variables = {"params": params}
    track_bn = len(jax.tree_util.tree_leaves(batch_stats)) > 0
    if track_bn:
        variables["batch_stats"] = batch_stats
        out, updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key})
        return _logits(out), updates["batch_stats"]
    out = model.apply(variables, x, train=True,
                      rngs={"dropout": dropout_key})
    return _logits(out), batch_stats


def _teacher_forward(model, params, batch_stats, x, dropout_key):
    """Teacher runs in train mode with live dropout, like the reference's
    ``ema_model.train()`` (`LA_BCP_train.py:225`); its BN uses batch stats
    and any running-stat updates are discarded."""
    logits, _ = _apply_train(model, params, batch_stats, x, dropout_key)
    return jax.lax.stop_gradient(logits)


def _grouped(model):
    """Clone a model with 2-group BatchNorm for the concat forward of the
    two mixed sub-batches. The reference issues separate forwards per
    sub-stream (`LA_BCP_train.py:241-242,252-253`); a concat forward with
    per-group BN statistics (layers.TorchBatchNorm) is numerically
    identical while keeping the MXU batch large — and, unlike a vmapped
    pair of forwards, its gradient fits v5e HBM at the real LA shapes."""
    if hasattr(model, "bn_groups"):
        return model.clone(bn_groups=2)
    return model


def _sample_mask(cfg: Config, key: jax.Array) -> jax.Array:
    if cfg.mask_kind == "fixed":
        return masks.cuboid_mask_fixed(key, cfg.patch_size, cfg.mask_patch)
    if cfg.mask_kind == "grid":
        # `random_mask` (`ACDC_BCP_train.py:142-154`, 27-cube 3D variant
        # `BCP_utils.py:30-46`)
        return masks.grid_mask(key, cfg.patch_size)
    if cfg.mask_kind == "slab":
        # `concate_mask` (z-slab 8/27, `BCP_utils.py:48-56`) in 3D,
        # `contact_mask` (row-slab 4/9, `ACDC_BCP_train.py:156-164`) in 2D
        if len(cfg.patch_size) == 3:
            return masks.slab_mask(key, cfg.patch_size, axis=-1,
                                   fraction=8.0 / 27.0)
        return masks.slab_mask(key, cfg.patch_size, axis=0,
                               fraction=4.0 / 9.0)
    return masks.cuboid_mask(key, cfg.patch_size, cfg.mask_ratio)


def _pseudo_label(cfg: Config, logits: jax.Array) -> jax.Array:
    if cfg.pseudo_label == "argmax":
        return cc.get_multiclass_mask(logits, cfg.num_classes, nms=cfg.nms,
                                      connectivity=cfg.cc_connectivity)
    return cc.get_cut_mask(logits, nms=cfg.nms,
                           connectivity=cfg.cc_connectivity)


def _bcast(mask: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast the shared spatial mask to a per-sample loss mask
    (the reference's ``loss_mask``, `BCP_utils.py:20,27`)."""
    return jnp.broadcast_to(mask[None], like.shape)


def mixed_inputs(variant: str, batch, mask):
    """The two bidirectionally-mixed student inputs
    (`LA_BCP_train.py:248-251`, `ACDC_BCP_train.py:372-373`,
    `train_pancreas.py:152-154`)."""
    a, b = batch["img_a"], batch["img_b"]
    ua, ub = batch["uimg_a"], batch["uimg_b"]
    if variant == "la":
        return masks.mix(a, ua, mask), masks.mix(ub, b, mask)
    if variant == "acdc":
        return masks.mix(ua, a, mask), masks.mix(b, ub, mask)
    # pancreas
    return masks.mix(ua, b, mask), masks.mix(a, ub, mask)


def _canonical_batch(batch):
    """Device-side cast from the compact wire format (bf16/uint8; see
    data.feed._stack): labels to int32 for one-hot/mix arithmetic."""
    out = {}
    for k, v in batch.items():
        out[k] = v.astype(jnp.int32) if k.startswith("lab") else v
    return out


# --------------------------------------------------------------------------
# pre-train

def _maybe_scan(body: Callable, n_steps: int) -> Callable:
    """jit ``body(state, batch, key)`` — or, for ``n_steps > 1``, a
    ``lax.scan`` of it over leading-stacked batches/keys (one XLA program
    executes n_steps full updates; metrics come back leading-stacked).

    The scanned program runs the same math as n_steps separate
    dispatches — same per-step fold_in keys, same batch stream, same
    sequential BN/EMA threading — it only amortises the per-dispatch
    host/tunnel round-trips (`Config.steps_per_dispatch`). Equality is
    up to cross-program float reassociation (a different XLA schedule;
    ``tests/test_steps.py::test_steps_per_dispatch_identical``)."""
    if n_steps == 1:
        return partial(jax.jit, donate_argnums=(0,))(body)

    @partial(jax.jit, donate_argnums=(0,))
    def stepn(state: TrainState, batches, base_key, first_it):
        """batches: leading-(n_steps)-stacked batch pytree. Per-step keys
        are derived in-graph — fold_in(base_key, first_it + j) — exactly
        as the n_steps=1 trainer loop derives them on the host."""
        def scan_body(st, xs):
            b, j = xs
            key = jax.random.fold_in(base_key, first_it + j)
            return body(st, b, key)
        return jax.lax.scan(scan_body, state,
                            (batches, jnp.arange(n_steps)))

    return stepn


def make_pretrain_step(model, tx: optax.GradientTransformation,
                       cfg: Config, n_steps: int = 1) -> Callable:
    """Labeled-only copy-paste supervised step."""

    def loss_fn(params, batch_stats, batch, mask, dropout_key):
        img = masks.mix(batch["img_a"], batch["img_b"], mask)
        logits, new_bs = _apply_train(model, params, batch_stats, img,
                                      dropout_key)
        if cfg.variant == "acdc":
            # `ACDC_BCP_train.py:243-251`: mix_loss(lab_a, lab_b, loss_mask,
            # u_weight=1.0, unlab=True) -> both weights 1.0.
            lmask = _bcast(mask, batch["lab_a"])
            dice, ce = losses.mix_loss_slice(
                logits, batch["lab_a"], batch["lab_b"], lmask,
                cfg.num_classes, u_weight=1.0, unlab=True)
            loss = (dice + ce) / 2.0
            metrics = {"loss": loss, "loss_dice": dice, "loss_ce": ce}
        else:
            # `LA_BCP_train.py:155-161` / `train_pancreas.py:86-92`:
            # plain CE + Dice on the mixed label.
            lab = masks.mix(batch["lab_a"], batch["lab_b"], mask)
            ce = losses.cross_entropy_mean(logits, lab)
            dice = losses.masked_dice_loss(logits, lab)
            loss = (ce + dice) / 2.0
            metrics = {"loss": loss, "loss_dice": dice, "loss_ce": ce}
            if cfg.variant == "pancreas":
                # online train dice, `CutPreMeasures.update` ->
                # `get_mask` + `dice_ratio` (`pancreas_utils.py:128-134,
                # 153-157`; `statistic.py:28-43`): class-1 prob >= 0.5 vs
                # the mixed label, global binary dice, +1e-6 smoothing.
                pred = (jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1)[..., 1]
                    >= 0.5).astype(jnp.float32)
                labf = lab.astype(jnp.float32)
                inter = (pred * labf).sum()
                metrics["train_dice"] = (
                    2.0 * inter / (pred.sum() + labf.sum() + 1e-6))
        return loss, (new_bs, metrics)

    def step(state: TrainState, batch: Dict[str, jax.Array],
             key: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        batch = _canonical_batch(batch)
        mask_key, drop_key = jax.random.split(key)
        mask = _sample_mask(cfg, mask_key)
        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, mask, drop_key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt), metrics

    return _maybe_scan(step, n_steps)


# --------------------------------------------------------------------------
# self-train

def make_selftrain_step(model, tx: optax.GradientTransformation,
                        cfg: Config, n_steps: int = 1) -> Callable:
    """Bidirectional copy-paste mean-teacher step (one XLA program)."""
    variant = cfg.variant

    def losses_for(logits1, logits2, batch, plab_a, plab_b, mask):
        if variant == "la":
            # `LA_BCP_train.py:248-257`: mix1 = lab bg + unlab patch,
            # mix2 = unlab bg + lab patch.
            lmask = _bcast(mask, batch["lab_a"])
            loss_l = losses.mix_loss_volume(
                logits1, batch["lab_a"], plab_a, lmask, u_weight=cfg.u_weight)
            loss_u = losses.mix_loss_volume(
                logits2, plab_b, batch["lab_b"], lmask,
                u_weight=cfg.u_weight, unlab=True)
            return loss_l + loss_u, {"loss_l": loss_l, "loss_u": loss_u}
        if variant == "acdc":
            # `ACDC_BCP_train.py:372-383`.
            lmask = _bcast(mask, batch["lab_a"])
            unl_d, unl_c = losses.mix_loss_slice(
                logits1, plab_a, batch["lab_a"], lmask, cfg.num_classes,
                u_weight=cfg.u_weight, unlab=True)
            l_d, l_c = losses.mix_loss_slice(
                logits2, batch["lab_b"], plab_b, lmask, cfg.num_classes,
                u_weight=cfg.u_weight)
            loss = ((unl_d + l_d) + (unl_c + l_c)) / 2.0
            return loss, {"loss_dice": unl_d + l_d, "loss_ce": unl_c + l_c}
        if variant == "pancreas":
            # `train_pancreas.py:155-166`.
            lmask = _bcast(mask, batch["lab_a"])
            loss_1 = losses.mix_loss_volume(
                logits1, plab_a, batch["lab_b"], lmask,
                u_weight=cfg.u_weight, unlab=True)
            loss_2 = losses.mix_loss_volume(
                logits2, batch["lab_a"], plab_b, lmask,
                u_weight=cfg.u_weight)
            return loss_1 + loss_2, {"loss_l": loss_1, "loss_u": loss_2}
        raise ValueError(f"unknown variant {variant!r}")

    gmodel = _grouped(model) if cfg.fuse_subbatches else model

    def loss_fn(params, batch_stats, batch, plab_a, plab_b, mask, dkey):
        in1, in2 = mixed_inputs(variant, batch, mask)
        n = in1.shape[0]
        if cfg.fuse_subbatches:
            # One concat forward with 2-group BN == the reference's two
            # separate forwards (`LA_BCP_train.py:252-253`).
            logits, new_bs = _apply_train(gmodel, params, batch_stats,
                                          jnp.concatenate([in1, in2]),
                                          dkey)
            logits1, logits2 = logits[:n], logits[n:]
        else:
            # Two sequential forwards, as in the reference; BN running
            # stats thread through forward-by-forward.
            k1, k2 = jax.random.split(dkey)
            logits1, bs1 = _apply_train(model, params, batch_stats, in1,
                                        k1)
            logits2, new_bs = _apply_train(model, params, bs1, in2, k2)
        loss, parts = losses_for(logits1, logits2, batch, plab_a,
                                 plab_b, mask)
        parts["loss"] = loss
        return loss, (new_bs, parts)

    def step(state: TrainState, batch: Dict[str, jax.Array],
             key: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        batch = _canonical_batch(batch)
        mask_key, tkey, skey = jax.random.split(key, 3)

        # Teacher pseudo-labels for the two unlabeled sub-streams
        # (`LA_BCP_train.py:240-244`); NMS stays on device.
        usub = batch["uimg_a"].shape[0]
        if cfg.fuse_subbatches:
            t_logits = _teacher_forward(
                gmodel, state.teacher_params, state.teacher_batch_stats,
                jnp.concatenate([batch["uimg_a"], batch["uimg_b"]]), tkey)
            plab = _pseudo_label(cfg, t_logits)
        else:
            tk1, tk2 = jax.random.split(tkey)
            t_a = _teacher_forward(model, state.teacher_params,
                                   state.teacher_batch_stats,
                                   batch["uimg_a"], tk1)
            t_b = _teacher_forward(model, state.teacher_params,
                                   state.teacher_batch_stats,
                                   batch["uimg_b"], tk2)
            plab = _pseudo_label(cfg, jnp.concatenate([t_a, t_b]))
        plab_a, plab_b = plab[:usub], plab[usub:]

        mask = _sample_mask(cfg, mask_key)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, plab_a, plab_b, mask,
            skey)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # EMA teacher update from the *new* student params, after the
        # optimizer step (`LA_BCP_train.py:270`, `ACDC_BCP_train.py:390`).
        new_teacher = ema_update(state.teacher_params, new_params,
                                 cfg.ema_alpha)
        if cfg.ema_full_state:
            # ACDC interpolates the whole state_dict incl. BN buffers
            # (`ACDC_BCP_train.py:123-129`).
            new_teacher_bs = ema_update(state.teacher_batch_stats, new_bs,
                                        cfg.ema_alpha)
        else:
            # LA/pancreas: params only (`BCP_utils.py:78-81`).
            new_teacher_bs = state.teacher_batch_stats

        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            teacher_params=new_teacher, teacher_batch_stats=new_teacher_bs,
            opt_state=new_opt), metrics

    return _maybe_scan(step, n_steps)
