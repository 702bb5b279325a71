"""Model parity tests: parameter counts computed analytically from the
reference architecture (`networks/VNet.py`, `networks/unet.py`), forward
shapes, channel-dropout semantics, and the align_corners upsample vs torch.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bcp_tpu.models import UNet2D, VNet3D, create_model
from bcp_tpu.models.layers import upsample2x_align_corners


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def conv_p(i, o, k, ndim):
    return i * o * k ** ndim + o


def bn_p(o):
    return 2 * o  # scale + bias (running stats live in batch_stats)


def expected_vnet_params(in_ch=1, classes=2, nf=16, norm=True):
    """Analytic count from networks/VNet.py:145-239 (heads omitted)."""
    p = 0
    nrm = bn_p if norm else (lambda o: 0)
    # encoder conv stages: (n_stages, in, out)
    enc = [(1, in_ch, nf), (2, 2 * nf, 2 * nf), (3, 4 * nf, 4 * nf),
           (3, 8 * nf, 8 * nf), (3, 16 * nf, 16 * nf)]
    # decoder conv stages
    dec = [(3, 8 * nf, 8 * nf), (3, 4 * nf, 4 * nf), (2, 2 * nf, 2 * nf),
           (1, nf, nf)]
    for n, i, o in enc + dec:
        for s in range(n):
            p += conv_p(i if s == 0 else o, o, 3, 3) + nrm(o)
    # downsampling 2^3 stride-2 convs
    for i, o in [(nf, 2 * nf), (2 * nf, 4 * nf), (4 * nf, 8 * nf),
                 (8 * nf, 16 * nf)]:
        p += conv_p(i, o, 2, 3) + nrm(o)
    # upsampling 2^3 deconvs
    for i, o in [(16 * nf, 8 * nf), (8 * nf, 4 * nf), (4 * nf, 2 * nf),
                 (2 * nf, nf)]:
        p += conv_p(i, o, 2, 3) + nrm(o)
    p += conv_p(nf, classes, 1, 3)  # out conv
    return p


def expected_unet_params(in_ch=1, classes=4, ft=(16, 32, 64, 128, 256)):
    """Analytic count from networks/unet.py:60-116 (heads omitted)."""
    def convblock(i, o):
        return conv_p(i, o, 3, 2) + bn_p(o) + conv_p(o, o, 3, 2) + bn_p(o)
    p = convblock(in_ch, ft[0])
    for a, b in zip(ft[:-1], ft[1:]):
        p += convblock(a, b)
    # UpBlocks: conv1x1(deep->skip) + convblock(2*skip -> out=skip)
    for deep, skip in zip(ft[:0:-1], ft[-2::-1]):
        p += conv_p(deep, skip, 1, 2) + convblock(2 * skip, skip)
    p += conv_p(ft[0], classes, 3, 2)
    return p


@pytest.fixture(scope="module")
def vnet_vars():
    model = VNet3D(n_classes=2, has_dropout=True)
    x = jnp.zeros((1, 16, 16, 16, 1))
    return model, model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)


@pytest.fixture(scope="module")
def unet_vars():
    model = UNet2D(n_classes=4)
    x = jnp.zeros((1, 32, 32, 1))
    return model, model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)


def test_vnet_param_count(vnet_vars):
    _, variables = vnet_vars
    assert n_params(variables["params"]) == expected_vnet_params()


def test_unet_param_count(unet_vars):
    _, variables = unet_vars
    assert n_params(variables["params"]) == expected_unet_params()


def test_vnet_forward_shapes(vnet_vars):
    model, variables = vnet_vars
    x = jnp.ones((2, 16, 16, 16, 1))
    (logits, feats), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert logits.shape == (2, 16, 16, 16, 2)
    assert feats.shape == (2, 16, 16, 16, 16)


def test_unet_forward_shapes(unet_vars):
    model, variables = unet_vars
    x = jnp.ones((3, 32, 32, 1))
    logits, feats = model.apply(variables, x, train=False)
    assert logits.shape == (3, 32, 32, 4)
    assert feats.shape == (3, 32, 32, 16)


def test_vnet_batchstats_update(vnet_vars):
    model, variables = vnet_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 16, 1))
    _, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old, new))


def test_vnet_channel_dropout_zeroes_whole_channels(vnet_vars):
    """torch Dropout3d semantics: a dropped channel is zero everywhere."""
    model = VNet3D(n_classes=2, has_dropout=True, normalization="none")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    # Run twice with different dropout keys; outputs must differ (dropout
    # active in train mode).
    y1, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(10)})
    y2, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(11)})
    assert not np.allclose(np.asarray(y1[0]), np.asarray(y2[0]))
    # Deterministic in eval mode.
    z1 = model.apply(variables, x, train=False)
    z2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(z1[0]), np.asarray(z2[0]))


def test_upsample_matches_torch_align_corners():
    x = np.random.default_rng(0).normal(size=(2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=2, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_factory():
    m = create_model("VNet", class_num=2, mode="train")
    assert isinstance(m, VNet3D) and m.has_dropout
    m = create_model("VNet", class_num=2, mode="test")
    assert not m.has_dropout
    m = create_model("unet", class_num=4)
    assert isinstance(m, UNet2D)
    m = create_model("VNet_pancreas", class_num=2)
    assert m.normalization == "instancenorm"
    with pytest.raises(KeyError):
        create_model("nope", class_num=2)


def test_vnet_instancenorm_no_batchstats():
    model = VNet3D(n_classes=2, normalization="instancenorm")
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "batch_stats" not in variables


def test_vnet_remat_bit_identical():
    """Config.remat (jax.checkpoint per V-Net stage) must not change any
    number: loss, grads and BN-stat updates are bit-identical to the
    plain model; param trees interchange (the trainer evals remat-trained
    params through the plain test-mode model)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bcp_tpu.models import create_model

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                     (2, 16, 16, 16, 1)), np.float32)
    outs = {}
    for rm in (False, True):
        m = create_model("VNet", 2, n_filters=4, remat=rm)
        v = jax.jit(lambda r, y, m=m: m.init(r, y, train=False))(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, x)

        def loss(p, bs, y, m=m):
            (lo, _), upd = m.apply(
                {"params": p, "batch_stats": bs}, y, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.sum(lo ** 2), upd["batch_stats"]

        (l, bs2), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
            v["params"], v["batch_stats"], x)
        outs[rm] = (float(l), g, bs2, v)

    assert outs[False][0] == outs[True][0]
    for a, b in zip(jax.tree_util.tree_leaves(outs[False][1]),
                    jax.tree_util.tree_leaves(outs[True][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(outs[False][2]),
                    jax.tree_util.tree_leaves(outs[True][2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (jax.tree_util.tree_structure(outs[False][3])
            == jax.tree_util.tree_structure(outs[True][3]))
