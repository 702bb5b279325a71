"""Golden tests: bcp_tpu.ops.losses vs the exact torch semantics the
reference relies on (`utils/losses.py`, `utils/BCP_utils.py:58-76`,
`ACDC_BCP_train.py:167-179`). torch (CPU) is only a test oracle here."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bcp_tpu.ops import losses

RNG = np.random.default_rng(0)


def _rand_case(n=2, spatial=(5, 6, 4), c=2):
    logits = RNG.normal(size=(n, *spatial, c)).astype(np.float32)
    target = RNG.integers(0, c, size=(n, *spatial)).astype(np.int32)
    mask = RNG.integers(0, 2, size=(n, *spatial)).astype(np.int32)
    return logits, target, mask


def _to_torch_ncs(logits):
    # channels-last (N, *S, C) -> channels-first (N, C, *S)
    x = torch.from_numpy(logits)
    perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    return x.permute(*perm).contiguous()


def torch_mask_dice(logits, target, mask=None, smooth=1e-5):
    """Oracle for mask_DiceLoss.forward (utils/losses.py:47-77)."""
    lt = _to_torch_ncs(logits)
    n, c = lt.shape[0], lt.shape[1]
    pred = torch.softmax(lt.reshape(n, c, -1), dim=1)
    t = torch.from_numpy(target.astype(np.int64)).reshape(n, 1, -1)
    t1h = torch.zeros(n, c, t.shape[-1]).scatter_(1, t, 1)
    inter, union = pred * t1h, pred + t1h
    if mask is not None:
        m = torch.from_numpy(mask.astype(np.float32)).reshape(n, 1, -1)
        inter, union = inter * m, union * m
    inter, union = inter.sum(2), union.sum(2)
    dice = (2 * inter + smooth) / (union + smooth)
    return float(1 - dice.mean())


def torch_masked_ce(logits, target, mask):
    """Oracle for the inline masked CE (utils/BCP_utils.py:66-67)."""
    lt = _to_torch_ncs(logits)
    t = torch.from_numpy(target.astype(np.int64))
    m = torch.from_numpy(mask.astype(np.float32))
    ce = F.cross_entropy(lt, t, reduction="none")
    return float((ce * m).sum() / (m.sum() + 1e-16))


def torch_dice_per_class(probs_cl, target, n_classes, mask=None):
    """Oracle for DiceLoss (utils/losses.py:79-134), probs channels-last."""
    p = _to_torch_ncs(probs_cl)
    t = torch.from_numpy(target.astype(np.int64))
    smooth = 1e-10
    loss = 0.0
    for i in range(n_classes):
        ti = (t == i).float()
        si = p[:, i]
        if mask is not None:
            m = torch.from_numpy(mask.astype(np.float32))
            I = (si * ti * m).sum(); y = (ti * ti * m).sum()
            z = (si * si * m).sum()
        else:
            I = (si * ti).sum(); y = (ti * ti).sum(); z = (si * si).sum()
        loss += 1 - (2 * I + smooth) / (z + y + smooth)
    return float(loss / n_classes)


def test_masked_dice_matches_torch():
    logits, target, mask = _rand_case()
    got = float(losses.masked_dice_loss(jnp.asarray(logits),
                                        jnp.asarray(target),
                                        jnp.asarray(mask)))
    want = torch_mask_dice(logits, target, mask)
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_dice_no_mask_matches_torch():
    logits, target, _ = _rand_case(c=4, spatial=(7, 5))
    got = float(losses.masked_dice_loss(jnp.asarray(logits),
                                        jnp.asarray(target)))
    want = torch_mask_dice(logits, target, None)
    assert got == pytest.approx(want, rel=1e-5)


def test_sigmoid_path_single_channel():
    logits, _, _ = _rand_case(c=1)
    probs = np.asarray(losses.softmax_probs(jnp.asarray(logits)))
    sig = 1 / (1 + np.exp(-logits[..., 0]))
    np.testing.assert_allclose(probs[..., 1], sig, rtol=1e-5)
    np.testing.assert_allclose(probs[..., 0], 1 - sig, rtol=1e-5)


def test_masked_ce_matches_torch():
    logits, target, mask = _rand_case()
    got = float(losses.masked_cross_entropy(jnp.asarray(logits),
                                            jnp.asarray(target),
                                            jnp.asarray(mask)))
    want = torch_masked_ce(logits, target, mask)
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_mean_matches_torch():
    logits, target, _ = _rand_case(c=4)
    got = float(losses.cross_entropy_mean(jnp.asarray(logits),
                                          jnp.asarray(target)))
    lt = _to_torch_ncs(logits)
    want = float(F.cross_entropy(lt, torch.from_numpy(
        target.astype(np.int64))))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_per_class_matches_torch():
    logits, target, mask = _rand_case(c=4, spatial=(9, 8))
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    got = float(losses.dice_loss_per_class(jnp.asarray(probs),
                                           jnp.asarray(target), 4,
                                           jnp.asarray(mask)))
    want = torch_dice_per_class(probs, target, 4, mask)
    assert got == pytest.approx(want, rel=1e-4)


def test_mix_loss_volume_weight_swap():
    """unlab=True must swap image/patch weights (BCP_utils.py:60-63)."""
    logits, t1, mask = _rand_case()
    t2 = RNG.integers(0, 2, size=t1.shape).astype(np.int32)
    args = (jnp.asarray(logits), jnp.asarray(t1), jnp.asarray(t2),
            jnp.asarray(mask[0]))  # shared mask, no batch dim
    mask_b = jnp.broadcast_to(args[3][None], t1.shape)
    lab = losses.mix_loss_volume(args[0], args[1], args[2], mask_b,
                                 u_weight=0.5, unlab=False)
    unl = losses.mix_loss_volume(args[0], args[1], args[2], mask_b,
                                 u_weight=0.5, unlab=True)
    # Manual recomposition from the parts:
    d1 = losses.masked_dice_loss(args[0], args[1], mask_b)
    d2 = losses.masked_dice_loss(args[0], args[2], 1 - mask_b)
    c1 = losses.masked_cross_entropy(args[0], args[1], mask_b)
    c2 = losses.masked_cross_entropy(args[0], args[2], 1 - mask_b)
    want_lab = (d1 * 1.0 + d2 * 0.5 + c1 * 1.0 + c2 * 0.5) / 2
    want_unl = (d1 * 0.5 + d2 * 1.0 + c1 * 0.5 + c2 * 1.0) / 2
    assert float(lab) == pytest.approx(float(want_lab), rel=1e-6)
    assert float(unl) == pytest.approx(float(want_unl), rel=1e-6)


def test_mix_loss_slice_returns_pair():
    logits, t1, mask = _rand_case(c=4, spatial=(16, 16))
    t2 = RNG.integers(0, 4, size=t1.shape).astype(np.int32)
    dice, ce = losses.mix_loss_slice(jnp.asarray(logits), jnp.asarray(t1),
                                     jnp.asarray(t2), jnp.asarray(mask), 4)
    assert np.isfinite(float(dice)) and np.isfinite(float(ce))


def test_sup_loss_is_mean_of_dice_and_ce():
    logits, target, _ = _rand_case()
    got = float(losses.sup_loss(jnp.asarray(logits), jnp.asarray(target)))
    want = (torch_mask_dice(logits, target)
            + float(F.cross_entropy(_to_torch_ncs(logits),
                                    torch.from_numpy(
                                        target.astype(np.int64))))) / 2
    assert got == pytest.approx(want, rel=1e-5)
