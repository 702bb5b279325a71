"""Golden tests for the dead-code loss tail (bcp_tpu.extras.losses) against
torch oracles written to the reference's formulas
(`code/utils/losses.py:137-170,208-308,326-388`). torch (CPU) is only an
oracle here."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from bcp_tpu.extras import losses as X

RNG = np.random.default_rng(7)


def _rand_case(n=2, spatial=(5, 6), c=4):
    logits = RNG.normal(size=(n, *spatial, c)).astype(np.float32)
    target = RNG.integers(0, c, size=(n, *spatial)).astype(np.int32)
    mask = RNG.integers(0, 2, size=(n, *spatial)).astype(np.int32)
    return logits, target, mask


def _ncs(x):
    t = torch.from_numpy(x)
    perm = (0, t.ndim - 1) + tuple(range(1, t.ndim - 1))
    return t.permute(*perm).contiguous()


def torch_masked_onehot_ce(logits, target, mask):
    """Oracle for CrossEntropyLoss (`losses.py:137-170`), incl. the
    all-ones class-0 mask channel of `_one_hot_mask_encoder`."""
    lt = _ncs(logits)
    c = lt.shape[1]
    probs = torch.softmax(lt, dim=1)
    t = torch.from_numpy(target.astype(np.int64))
    m = torch.from_numpy(mask.astype(np.float32))
    loss = 0.0
    for i in range(c):
        t_i = (t == i).float()
        m_i = torch.ones_like(m) if i == 0 else m
        loss += float((-t_i * torch.log(probs[:, i]) * m_i).sum()
                      / (m_i.sum() + 1e-16))
    return loss / c


def torch_dice_weighted(logits, target, mask=None, smooth=1e-5):
    """Oracle for Dice_Loss.forward (`losses.py:247-277`)."""
    lt = _ncs(logits)
    n, c = lt.shape[0], lt.shape[1]
    pred = torch.softmax(lt.reshape(n, c, -1), dim=1)
    t = torch.from_numpy(target.astype(np.int64)).reshape(n, 1, -1)
    t1h = torch.zeros(n, c, t.shape[-1]).scatter_(1, t, 1)
    inter, union = pred * t1h, pred + t1h
    if mask is not None:
        m = torch.from_numpy(mask.astype(np.float32)).reshape(n, 1, -1)
        inter, union = inter * m, union * m
    dice = (2 * inter.sum(2) + smooth) / (union.sum(2) + smooth)
    return float(1 - dice.mean())


def torch_soft_dice(probs_cl, target_cl, smooth=1e-10):
    """Oracle for softDiceLoss (`losses.py:285-308`)."""
    p, t = _ncs(probs_cl), _ncs(target_cl)
    loss = 0.0
    for i in range(p.shape[1]):
        s, tt = p[:, i], t[:, i].float()
        inter = (s * tt).sum()
        loss += float(1 - (2 * inter + smooth)
                      / ((s * s).sum() + (tt * tt).sum() + smooth))
    return loss / p.shape[1]


def test_masked_onehot_cross_entropy():
    logits, target, mask = _rand_case()
    got = float(X.masked_onehot_cross_entropy(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(mask)))
    want = torch_masked_onehot_ce(logits, target, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss_weighted_with_and_without_mask():
    logits, target, mask = _rand_case(spatial=(7, 5), c=3)
    for m in (None, mask):
        got = float(X.dice_loss_weighted(
            jnp.asarray(logits), jnp.asarray(target),
            None if m is None else jnp.asarray(m)))
        want = torch_dice_weighted(logits, target, m)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss_weighted_sigmoid_path():
    # C == 1 -> sigmoid + [1-p, p] expansion (`get_probability`)
    logits = RNG.normal(size=(2, 6, 6, 1)).astype(np.float32)
    target = RNG.integers(0, 2, size=(2, 6, 6)).astype(np.int32)
    lt = torch.from_numpy(logits[..., 0])[:, None]
    p = torch.sigmoid(lt)
    pred = torch.cat([1 - p, p], dim=1).numpy()
    pred_cl = np.moveaxis(pred, 1, -1)
    got = float(X.dice_loss_weighted(jnp.asarray(logits),
                                     jnp.asarray(target)))
    want = float(X.dice_loss_weighted_probs(jnp.asarray(pred_cl),
                                            jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_binary_dice_loss():
    p = RNG.random((2, 4, 4, 2)).astype(np.float32)
    t = RNG.random((2, 4, 4, 2)).astype(np.float32)
    got = float(X.binary_dice_loss(jnp.asarray(p), jnp.asarray(t)))
    pt, tt = torch.from_numpy(p), torch.from_numpy(t)
    inter = 2 * (pt * tt).sum() + 1e-8
    union = pt.sum() + tt.sum() + 1e-8
    np.testing.assert_allclose(got, float(1 - inter / union), rtol=1e-6)


def test_soft_dice_loss():
    probs = jax.nn.softmax(jnp.asarray(
        RNG.normal(size=(2, 5, 5, 4)).astype(np.float32)), axis=-1)
    tgt = jax.nn.one_hot(
        jnp.asarray(RNG.integers(0, 4, size=(2, 5, 5))), 4)
    got = float(X.soft_dice_loss(probs, tgt))
    want = torch_soft_dice(np.asarray(probs), np.asarray(tgt))
    np.testing.assert_allclose(got, want, rtol=1e-5)


class _TorchLinearNet(torch.nn.Module):
    """Tiny deterministic 'model': per-pixel linear map, so the VAT oracle
    needs no conv weights to agree with the jax side."""

    def __init__(self, w, b):
        super().__init__()
        self.w = torch.nn.Parameter(torch.from_numpy(w))  # (C, Cin)
        self.b = torch.nn.Parameter(torch.from_numpy(b))  # (C,)

    def forward(self, x):  # x (N, Cin, H, W) -> (N, C, H, W)
        y = torch.einsum("nihw,ci->nchw", x, self.w)
        return y + self.b[None, :, None, None], None


def _torch_vat(net, x, d0, xi, epi, ip, binary):
    """Oracle transcription of VAT2d/VAT3d.forward
    (`losses.py:326-388`) with an injected initial perturbation d0."""
    def l2n(d):
        dr = d.view(d.shape[0], -1)
        return d / (dr.norm(dim=1).view(-1, *([1] * (d.dim() - 1))) + 1e-8)

    def dist(p_hat, pred):
        if binary:
            inter = 2 * (p_hat * pred).sum() + 1e-8
            return 1 - inter / (p_hat.sum() + pred.sum() + 1e-8)
        smooth = 1e-10
        loss = 0.0
        for i in range(p_hat.shape[1]):
            s, t = p_hat[:, i], pred[:, i]
            loss = loss + 1 - ((2 * (s * t).sum() + smooth)
                               / ((s * s).sum() + (t * t).sum() + smooth))
        return loss / p_hat.shape[1]

    with torch.no_grad():
        pred = torch.softmax(net(x)[0], dim=1)
    d = l2n(d0.clone())
    for _ in range(ip):
        d.requires_grad_(True)
        adv = dist(torch.softmax(net(x + xi * d)[0], dim=1), pred)
        adv.backward()
        d = l2n(d.grad)
        net.zero_grad()
    with torch.no_grad():
        return float(dist(torch.softmax(net(x + epi * d)[0], dim=1), pred))


def _vat_case(binary):
    w = RNG.normal(size=(4, 1)).astype(np.float32)
    b = RNG.normal(size=(4,)).astype(np.float32)
    x = RNG.normal(size=(2, 6, 6, 1)).astype(np.float32)
    d0 = (RNG.random(size=x.shape).astype(np.float32) - 0.5)

    def jax_forward(xj):  # channels-last linear map
        return jnp.einsum("nhwi,ci->nhwc", xj, jnp.asarray(w)) + jnp.asarray(b)

    net = _TorchLinearNet(w, b)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1)).contiguous()
    d0t = torch.from_numpy(np.moveaxis(d0, -1, 1)).contiguous()
    return jax_forward, net, x, xt, d0, d0t


def test_vat_2d_matches_torch_oracle(monkeypatch):
    jax_forward, net, x, xt, d0, d0t = _vat_case(binary=False)
    # inject the same initial perturbation on both sides
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape: jnp.asarray(d0) + 0.5)
    got = float(X.vat_loss_2d(jax_forward, jnp.asarray(x),
                              jax.random.PRNGKey(0), xi=2.0, epi=1.5, ip=2))
    want = _torch_vat(net, xt, d0t, xi=2.0, epi=1.5, ip=2, binary=False)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_vat_3d_matches_torch_oracle(monkeypatch):
    jax_forward, net, x, xt, d0, d0t = _vat_case(binary=True)
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape: jnp.asarray(d0) + 0.5)
    got = float(X.vat_loss_3d(jax_forward, jnp.asarray(x),
                              jax.random.PRNGKey(0), xi=2.0, epi=1.5, ip=1))
    want = _torch_vat(net, xt, d0t, xi=2.0, epi=1.5, ip=1, binary=True)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_vat_runs_on_a_real_model():
    """VAT against the actual UNet2d, jitted — the usage the reference's
    dead code implies (`VAT2d(model, volume_batch)`)."""
    from bcp_tpu.models import create_model
    model = create_model("unet", class_num=4)
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)

    def forward(xj):
        out = model.apply(variables, xj, train=False)
        return out[0] if isinstance(out, tuple) else out

    loss = jax.jit(lambda xj, k: X.vat_loss_2d(forward, xj, k))(
        jnp.asarray(RNG.normal(size=(2, 16, 16, 1)).astype(np.float32)),
        jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
