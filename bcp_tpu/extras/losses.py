"""The reference's dead-code loss inventory, completed (SURVEY.md C12 tail).

None of these is reachable from any reference entry point, but they ship in
`code/utils/losses.py` and the component bar is *every* component:

- ``masked_onehot_cross_entropy`` <- class ``CrossEntropyLoss``
  (`code/utils/losses.py:137-170`), including its quirky
  ``_one_hot_mask_encoder`` (the class-0 mask channel is all-ones because
  ``mask * 0 == 0`` everywhere).
- ``dice_loss_weighted``          <- class ``Dice_Loss``
  (`code/utils/losses.py:208-277`): per-(sample, class) one-hot dice with
  *linear* denominators, smooth 1e-5, optional flat pixel mask, plus the
  ``prob_forward`` variant that takes probabilities directly.
- ``binary_dice_loss``            <- ``Binary_dice_loss``
  (`code/utils/losses.py:279-283`): global soft dice, ep=1e-8 added to the
  intersection *numerator* as well.
- ``soft_dice_loss``              <- class ``softDiceLoss``
  (`code/utils/losses.py:285-308`): per-class squared-denominator dice over
  probability tensors, smooth 1e-10.
- ``vat_loss_2d`` / ``vat_loss_3d`` <- ``VAT2d`` / ``VAT3d``
  (`code/utils/losses.py:327-388`): virtual adversarial training as a pure
  function — the power-iteration refinement of the perturbation direction
  is ``jax.grad`` w.r.t. the perturbation (the reference's
  ``d.requires_grad_(); adv_distance.backward()``), the teacher prediction
  is ``stop_gradient`` (the reference's ``torch.no_grad``), and BN running
  stats are naturally untouched because the forward is applied without
  ``mutable`` (the reference's ``_disable_tracking_bn_stats``).

Layout is channels-last, matching the rest of the package; tests check the
numerics against torch oracles written to the reference's formulas.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from bcp_tpu.ops.losses import softmax_probs


def _one_hot(target: jax.Array, n_classes: int) -> jax.Array:
    return jax.nn.one_hot(target, n_classes, dtype=jnp.float32)


def masked_onehot_cross_entropy(logits: jax.Array, target: jax.Array,
                                mask: jax.Array) -> jax.Array:
    """`CrossEntropyLoss.forward` (`code/utils/losses.py:159-170`).

    logits ``(N, *S, C)``, integer target ``(N, *S)``, binary mask
    ``(N, *S)``. Per class c: ``sum(-onehot_c * log(p_c) * mask_c) /
    (sum(mask_c) + 1e-16)`` averaged over classes, where the mask channel
    for class 0 is all-ones (`_one_hot_mask_encoder`, `losses.py:150-156`:
    ``mask * i == i`` is identically true at i = 0).
    """
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = _one_hot(target, n_classes)
    maskf = mask.astype(jnp.float32)
    loss = 0.0
    for c in range(n_classes):
        m_c = jnp.ones_like(maskf) if c == 0 else maskf
        num = (-onehot[..., c] * jnp.log(probs[..., c]) * m_c).sum()
        loss += num / (m_c.sum() + 1e-16)
    return loss / n_classes


def dice_loss_weighted(logits: jax.Array, target: jax.Array,
                       mask: Optional[jax.Array] = None,
                       smooth: float = 1e-5) -> jax.Array:
    """`Dice_Loss.forward` (`code/utils/losses.py:247-277`).

    Per-(sample, class) dice with linear denominators:
    ``(2*inter + s) / (p_sum + t_sum + s)``; probabilities via the
    sigmoid-for-C=1 rule (`get_probability`). Optional flat pixel mask
    multiplies both sums.
    """
    probs = softmax_probs(logits)
    n = probs.shape[0]
    n_classes = probs.shape[-1]
    p = probs.reshape(n, -1, n_classes)
    t = _one_hot(target.reshape(n, -1), n_classes)
    inter = p * t
    union = p + t
    if mask is not None:
        m = mask.reshape(n, -1, 1).astype(jnp.float32)
        inter = inter * m
        union = union * m
    inter = inter.sum(axis=1)
    union = union.sum(axis=1)
    dice = (2.0 * inter + smooth) / (union + smooth)
    return 1.0 - dice.mean()


def dice_loss_weighted_probs(probs: jax.Array, target: jax.Array,
                             mask: Optional[jax.Array] = None,
                             smooth: float = 1e-5) -> jax.Array:
    """`Dice_Loss.prob_forward` (`code/utils/losses.py:221-245`):
    probabilities supplied directly (channels-last)."""
    n = probs.shape[0]
    n_classes = probs.shape[-1]
    p = probs.reshape(n, -1, n_classes)
    t = _one_hot(target.reshape(n, -1), n_classes)
    inter = p * t
    union = p + t
    if mask is not None:
        m = mask.reshape(n, -1, 1).astype(jnp.float32)
        inter = inter * m
        union = union * m
    dice = (2.0 * inter.sum(axis=1) + smooth) / (union.sum(axis=1) + smooth)
    return 1.0 - dice.mean()


def binary_dice_loss(pred: jax.Array, target: jax.Array,
                     ep: float = 1e-8) -> jax.Array:
    """`Binary_dice_loss` (`code/utils/losses.py:279-283`): global soft
    dice over same-shaped tensors, epsilon in the numerator too."""
    inter = 2.0 * (pred * target).sum() + ep
    union = pred.sum() + target.sum() + ep
    return 1.0 - inter / union


def soft_dice_loss(probs: jax.Array, target: jax.Array,
                   smooth: float = 1e-10) -> jax.Array:
    """`softDiceLoss.forward` (`code/utils/losses.py:285-308`): per-class
    squared-denominator dice over same-shaped probability tensors
    (channels-last), averaged over classes."""
    n_classes = probs.shape[-1]
    loss = 0.0
    for c in range(n_classes):
        s, t = probs[..., c], target[..., c].astype(jnp.float32)
        inter = (s * t).sum()
        denom = (s * s).sum() + (t * t).sum()
        loss += 1.0 - (2.0 * inter + smooth) / (denom + smooth)
    return loss / n_classes


def _l2_normalize(d: jax.Array) -> jax.Array:
    """Per-sample L2 normalisation over all non-batch dims
    (`_l2_normalize`, `code/utils/losses.py:320-324`)."""
    n = d.shape[0]
    norms = jnp.sqrt((d.reshape(n, -1) ** 2).sum(axis=1))
    norms = norms.reshape((n,) + (1,) * (d.ndim - 1))
    return d / (norms + 1e-8)


def _vat_loss(forward: Callable[[jax.Array], jax.Array], x: jax.Array,
              key: jax.Array, distance: Callable, xi: float, epi: float,
              ip: int) -> jax.Array:
    """Shared VAT power iteration. ``forward`` maps inputs to channels-last
    logits; ``distance`` compares two probability tensors."""
    pred = jax.lax.stop_gradient(jax.nn.softmax(forward(x), axis=-1))

    d = jax.random.uniform(key, x.shape) - 0.5
    d = _l2_normalize(d)

    def adv_distance(d_):
        p_hat = jax.nn.softmax(forward(x + xi * d_), axis=-1)
        return distance(p_hat, pred)

    for _ in range(ip):
        grad = jax.grad(adv_distance)(d)
        d = _l2_normalize(jax.lax.stop_gradient(grad))

    p_hat = jax.nn.softmax(forward(x + epi * d), axis=-1)
    return distance(p_hat, pred)


def vat_loss_2d(forward: Callable[[jax.Array], jax.Array], x: jax.Array,
                key: jax.Array, xi: float = 10.0, epi: float = 6.0,
                ip: int = 1, n_classes: int = 4) -> jax.Array:
    """`VAT2d.forward` (`code/utils/losses.py:326-351`): adversarial
    perturbation maximising the soft dice distance between the perturbed
    and clean softmax predictions. ``forward(x)`` must return channels-last
    logits (the reference's ``model(x)[0]``); pass e.g.
    ``lambda x: model.apply(vars, x, train=False)[0]``.
    """
    del n_classes  # the distance derives classes from the prob tensors
    return _vat_loss(forward, x, key, soft_dice_loss, xi, epi, ip)


def vat_loss_3d(forward: Callable[[jax.Array], jax.Array], x: jax.Array,
                key: jax.Array, xi: float = 10.0, epi: float = 6.0,
                ip: int = 1) -> jax.Array:
    """`VAT3d.forward` (`code/utils/losses.py:353-379`): same power
    iteration with `Binary_dice_loss` over the full probability tensors."""
    return _vat_loss(forward, x, key, binary_dice_loss, xi, epi, ip)
