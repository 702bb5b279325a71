"""TensorBoard image snapshots — the reference's training-panel grids.

Three reference surfaces, reproduced tag-for-tag:

- **LA self-train** (`LA_BCP_train.py:294-340`), every ``eval_every``
  iterations at ``iter % 200 == 1``: two ``add_images`` grids —
  ``Epoch_{e}_Iter_{i}_labeled`` and ``Epoch_{e}_Iter_{i}_unlabel`` — each
  a ``(D, 3, 3H+3w, W+w)`` per-z-slice stack of three rows: the mixed
  input (min-max normalised), the mixed target, and the student's class-1
  softmax, separated by white lines of width 2.
- **ACDC pre-train** (`ACDC_BCP_train.py:265-271`), every 20 iterations:
  ``pre_train/Mixed_Image`` / ``Mixed_Prediction`` (argmax x 50) /
  ``Mixed_GroundTruth`` (label x 50), sample index 1.
- **ACDC self-train** (`ACDC_BCP_train.py:399-413`), every 20 iterations:
  the same triple for both mixed streams — ``train/Un_Image`` /
  ``Un_Prediction`` / ``Un_GroundTruth`` and ``train/L_Image`` /
  ``L_Prediction`` / ``L_GroundTruth``. The ground-truth panels use the
  *true* labels of the unlabeled stream (`ACDC_BCP_train.py:368-369` —
  ACDC slices all carry labels), which the feeder ships as
  ``ulab_a``/``ulab_b`` side-channel keys.

The pancreas trainer and LA pre-train log no images in the reference.

TPU-native design: the panel tensors are recomputed by a small jitted
program from ``(state, batch, key)`` *before* the train step dispatches —
the same ``fold_in`` key reproduces the step's mask and teacher forward
exactly (same pre-update teacher params), so the mixed inputs/targets are
bit-identical to what the step consumed; hauling the training forward's
activations off-device every step just to keep 1-in-200 of them would cost
HBM traffic per iteration. One documented delta: the logged prediction
comes from a deterministic eval-mode forward of the (pre-update) student,
where the reference reuses its train-mode forward (live dropout).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp

from bcp_tpu.config import Config
from bcp_tpu.ops import masks
from bcp_tpu.train.steps import (_canonical_batch, _grouped, _logits,
                                 _pseudo_label, _sample_mask,
                                 _teacher_forward, mixed_inputs)

INS_WIDTH = 2   # separator width (`LA_BCP_train.py:295`)


def _eval_forward(model, params, batch_stats, x):
    variables = {"params": params}
    if len(jax.tree_util.tree_leaves(batch_stats)) > 0:
        variables["batch_stats"] = batch_stats
    return _logits(model.apply(variables, x, train=False))


def make_la_snapshot_fn(model, eval_model, cfg: Config) -> Callable:
    """Jitted ``(state, batch, key) -> {mixl/mixu: img, lab, prob}``:
    sample 0 of each mixed stream, the mixed target, and the student's
    class-1 softmax (`LA_BCP_train.py:305-327`)."""
    gmodel = _grouped(model) if cfg.fuse_subbatches else model

    @jax.jit
    def snap(state, batch, key) -> Dict[str, jax.Array]:
        batch = _canonical_batch(batch)
        mask_key, tkey, _ = jax.random.split(key, 3)
        usub = batch["uimg_a"].shape[0]
        # identical key path to make_selftrain_step -> identical mask,
        # identical teacher logits (pre-update teacher), identical plab
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
        in1, in2 = mixed_inputs("la", batch, mask)
        mixl_lab = masks.mix(batch["lab_a"], plab_a, mask)
        mixu_lab = masks.mix(plab_b, batch["lab_b"], mask)
        out = {}
        for tag, mix_img, mix_lab in (("mixl", in1, mixl_lab),
                                      ("mixu", in2, mixu_lab)):
            logits = _eval_forward(eval_model, state.params,
                                   state.batch_stats, mix_img[:1])
            prob1 = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1)[0, ..., 1]
            out[f"{tag}_img"] = mix_img[0, ..., 0].astype(jnp.float32)
            out[f"{tag}_lab"] = mix_lab[0].astype(jnp.float32)
            out[f"{tag}_prob"] = prob1
        return out

    return snap


def la_snapshot_grid(img: np.ndarray, lab: np.ndarray,
                     prob: np.ndarray) -> np.ndarray:
    """Build one ``(D, 3, 3H+3w, W+w)`` grid from ``(H, W, D)`` panels —
    `LA_BCP_train.py:296-321`: rows = min-max-normalised input / target /
    class-1 prob (grayscale replicated to RGB), white separators."""
    H, W, D = img.shape
    w = INS_WIDTH
    g = np.zeros((D, 3, 3 * H + 3 * w, W + w), np.float32)
    g[:, :, H:H + w, :] = 1.0
    g[:, :, 2 * H + w:2 * H + 2 * w, :] = 1.0
    g[:, :, 3 * H + 2 * w:3 * H + 3 * w, :] = 1.0
    g[:, :, :, W:W + w] = 1.0
    rng = img.max() - img.min()
    rows = [(img - img.min()) / (rng if rng > 0 else 1.0), lab, prob]
    for r, panel in enumerate(rows):
        block = panel.transpose(2, 0, 1)        # z-first, as permute(2,0,1)
        g[:, :, r * (H + w):r * (H + w) + H, :W] = block[:, None]
    return g


def make_acdc_snapshot_fn(model, eval_model, cfg: Config,
                          stage: str) -> Callable:
    """Jitted ``(state, batch, key[, ulab_a, ulab_b]) -> panels`` for the
    ACDC per-20-iteration image triples. Sample index 1, as the
    reference's ``[1, ...]`` (`ACDC_BCP_train.py:265-271,399-413`)."""
    gmodel = _grouped(model) if cfg.fuse_subbatches else model
    s = 1 if cfg.labeled_sub_bs > 1 else 0

    if stage == "pre":
        @jax.jit
        def snap(state, batch, key) -> Dict[str, jax.Array]:
            batch = _canonical_batch(batch)
            mask_key, _ = jax.random.split(key)
            mask = _sample_mask(cfg, mask_key)
            net_input = masks.mix(batch["img_a"], batch["img_b"], mask)
            gt_mixl = masks.mix(batch["lab_a"], batch["lab_b"], mask)
            logits = _eval_forward(eval_model, state.params,
                                   state.batch_stats,
                                   net_input[s:s + 1])
            pred = jnp.argmax(logits, axis=-1)[0]
            return {"pre_train/Mixed_Image": net_input[s, ..., 0],
                    "pre_train/Mixed_Prediction": pred * 50,
                    "pre_train/Mixed_GroundTruth": gt_mixl[s] * 50}

        return snap

    @jax.jit
    def snap(state, batch, key, ulab_a, ulab_b) -> Dict[str, jax.Array]:
        batch = _canonical_batch(batch)
        mask_key, _, _ = jax.random.split(key, 3)
        mask = _sample_mask(cfg, mask_key)
        in_unl, in_l = mixed_inputs("acdc", batch, mask)
        # true-label mixes (`ACDC_BCP_train.py:368-369`)
        unl_label = masks.mix(ulab_a.astype(jnp.int32), batch["lab_a"],
                              mask)
        l_label = masks.mix(batch["lab_b"], ulab_b.astype(jnp.int32),
                            mask)
        out = {}
        for tag, mix_img, mix_lab in (("Un", in_unl, unl_label),
                                      ("L", in_l, l_label)):
            logits = _eval_forward(eval_model, state.params,
                                   state.batch_stats, mix_img[s:s + 1])
            pred = jnp.argmax(logits, axis=-1)[0]
            out[f"train/{tag}_Image"] = mix_img[s, ..., 0]
            out[f"train/{tag}_Prediction"] = pred * 50
            out[f"train/{tag}_GroundTruth"] = mix_lab[s] * 50
        return out

    return snap
