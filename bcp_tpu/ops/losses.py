"""Segmentation losses (masked Dice + masked CE, and the BCP mix losses).

Numerics match the reference exactly (same smoothing constants, same
reduction orders); layout is channels-last ``(N, *spatial, C)`` logits and
``(N, *spatial)`` integer labels, the TPU-friendly convention.

Reference semantics implemented:

- ``masked_dice_loss``   <- `mask_DiceLoss.forward` (`code/utils/losses.py:47-77`)
  with the sigmoid-for-C=1 path of `get_probability` (`losses.py:192-206`);
  per-(sample, class) dice over flattened spatial dims, optional flat pixel
  mask, smooth 1e-5, ``1 - mean``.
- ``dice_loss_per_class`` <- `DiceLoss` (`losses.py:79-134`): global (batch +
  spatial) sums per class, *squared* denominators, smooth 1e-10, mean over
  classes, optional mask.
- ``masked_cross_entropy`` <- the inline masked CE of `mix_loss`
  (`utils/BCP_utils.py:66-67`): sum(CE*mask)/(sum(mask)+1e-16).
- ``mix_loss_volume``  <- `utils/BCP_utils.py:58-69` (LA / pancreas flavour,
  also `pancreas/losses.py:129-141`): scalar (dice+ce)/2 with the
  image/patch weight swap for ``unlab=True``.
- ``mix_loss_slice``   <- `ACDC_BCP_train.py:167-179`: returns the (dice, ce)
  pair separately (the ACDC trainer averages them after summing both
  directions).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def softmax_probs(logits: jax.Array) -> jax.Array:
    """Class probabilities; sigmoid expanded to [1-p, p] when C == 1.

    Mirrors `get_probability` (`code/utils/losses.py:192-206`).
    """
    if logits.shape[-1] == 1:
        p = jax.nn.sigmoid(logits)
        return jnp.concatenate([1.0 - p, p], axis=-1)
    return jax.nn.softmax(logits, axis=-1)


def _flatten(x: jax.Array, keep_last: bool) -> jax.Array:
    n = x.shape[0]
    if keep_last:
        return x.reshape(n, -1, x.shape[-1])
    return x.reshape(n, -1)


def masked_dice_loss(logits: jax.Array, target: jax.Array,
                     mask: Optional[jax.Array] = None,
                     smooth: float = 1e-5) -> jax.Array:
    """`mask_DiceLoss` semantics (`code/utils/losses.py:47-77`).

    logits ``(N, *S, C)``, integer target ``(N, *S)``, optional pixel mask
    ``(N, *S)`` applied to both intersection and union sums.
    """
    probs = softmax_probs(logits)
    nclass = probs.shape[-1]
    p = _flatten(probs, keep_last=True)                     # (N, P, C)
    t = jax.nn.one_hot(_flatten(target, False), nclass,
                       dtype=p.dtype)                       # (N, P, C)
    inter = p * t
    union = p + t
    if mask is not None:
        m = _flatten(mask, False).astype(p.dtype)[..., None]
        inter = inter * m
        union = union * m
    inter = inter.sum(axis=1)                               # (N, C)
    union = union.sum(axis=1)
    dice = (2.0 * inter + smooth) / (union + smooth)
    return 1.0 - dice.mean()


def dice_loss_per_class(probs: jax.Array, target: jax.Array,
                        n_classes: int,
                        mask: Optional[jax.Array] = None,
                        smooth: float = 1e-10) -> jax.Array:
    """`DiceLoss` semantics (`code/utils/losses.py:79-134`).

    ``probs`` are already-softmaxed ``(N, *S, C)``; sums are global over
    batch *and* spatial dims per class; denominators use squared terms.
    """
    t = jax.nn.one_hot(target, n_classes, dtype=probs.dtype)
    if mask is not None:
        m = mask.astype(probs.dtype)[..., None]
        inter = (probs * t * m).sum(axis=tuple(range(probs.ndim - 1)))
        y_sum = (t * t * m).sum(axis=tuple(range(probs.ndim - 1)))
        z_sum = (probs * probs * m).sum(axis=tuple(range(probs.ndim - 1)))
    else:
        inter = (probs * t).sum(axis=tuple(range(probs.ndim - 1)))
        y_sum = (t * t).sum(axis=tuple(range(probs.ndim - 1)))
        z_sum = (probs * probs).sum(axis=tuple(range(probs.ndim - 1)))
    dice = (2.0 * inter + smooth) / (z_sum + y_sum + smooth)
    return (1.0 - dice).mean()


def _pixel_ce(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Per-pixel cross entropy, the `nn.CrossEntropyLoss(reduction='none')`
    of `utils/BCP_utils.py:14`."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = jax.nn.one_hot(target, logits.shape[-1], dtype=logp.dtype)
    return -(logp * t).sum(axis=-1)


def masked_cross_entropy(logits: jax.Array, target: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """sum(CE * mask) / (sum(mask) + 1e-16) — `utils/BCP_utils.py:66-67`."""
    ce = _pixel_ce(logits, target)
    m = mask.astype(ce.dtype)
    return (ce * m).sum() / (m.sum() + 1e-16)


def cross_entropy_mean(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Plain mean CE — `F.cross_entropy` in `LA_BCP_train.py:159`."""
    return _pixel_ce(logits, target).mean()


def mix_loss_volume(logits: jax.Array, img_l: jax.Array, patch_l: jax.Array,
                    mask: jax.Array, l_weight: float = 1.0,
                    u_weight: float = 0.5, unlab: bool = False) -> jax.Array:
    """LA / pancreas mix loss — `utils/BCP_utils.py:58-69`.

    ``mask==1`` pixels carry ``img_l`` (weighted ``l_weight``; swapped to
    ``u_weight`` when ``unlab=True`` so ground-truth pixels always get
    weight 1.0 and pseudo-label pixels ``u_weight``).
    """
    image_w, patch_w = (u_weight, l_weight) if unlab else (l_weight, u_weight)
    patch_mask = 1 - mask
    dice = masked_dice_loss(logits, img_l, mask) * image_w
    dice = dice + masked_dice_loss(logits, patch_l, patch_mask) * patch_w
    ce = image_w * masked_cross_entropy(logits, img_l, mask)
    ce = ce + patch_w * masked_cross_entropy(logits, patch_l, patch_mask)
    return (dice + ce) / 2.0


def mix_loss_slice(logits: jax.Array, img_l: jax.Array, patch_l: jax.Array,
                   mask: jax.Array, n_classes: int, l_weight: float = 1.0,
                   u_weight: float = 0.5,
                   unlab: bool = False) -> Tuple[jax.Array, jax.Array]:
    """ACDC mix loss — `ACDC_BCP_train.py:167-179`. Returns (dice, ce)."""
    image_w, patch_w = (u_weight, l_weight) if unlab else (l_weight, u_weight)
    patch_mask = 1 - mask
    probs = jax.nn.softmax(logits, axis=-1)
    dice = dice_loss_per_class(probs, img_l, n_classes, mask) * image_w
    dice = dice + dice_loss_per_class(probs, patch_l, n_classes,
                                      patch_mask) * patch_w
    ce = image_w * masked_cross_entropy(logits, img_l, mask)
    ce = ce + patch_w * masked_cross_entropy(logits, patch_l, patch_mask)
    return dice, ce


def sup_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """(mask_DiceLoss + mean CE) / 2 — `utils/BCP_utils.py:71-76`."""
    return (masked_dice_loss(logits, target)
            + cross_entropy_mean(logits, target)) / 2.0


def softmax_mse(input_logits: jax.Array,
                target_logits: jax.Array) -> jax.Array:
    """Element-wise MSE between softmaxes, no reduction, gradients flow to
    inputs only — `pancreas/losses.py:114-127`."""
    a = jax.nn.softmax(input_logits, axis=-1)
    b = jax.lax.stop_gradient(jax.nn.softmax(target_logits, axis=-1))
    return (a - b) ** 2
