"""Zoo models (reference C26): UNet3D (residual) and UNETR forward shapes
and registration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.models import UNETR, UNet3D, create_model


def jinit(model, x, train=False):
    """Jitted model.init: one persistently-cached XLA program instead of
    hundreds of eager per-op dispatches (dominant cost on slow CI hosts)."""
    return jax.jit(lambda r, y: model.init(r, y, train=train))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x)


def japply(model, variables, x):
    return jax.jit(lambda v, y: model.apply(v, y, train=False))(variables, x)


def test_unet3d_forward():
    model = UNet3D(n_classes=2, feat_channels=(4, 8, 8, 16, 32))
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = jinit(model, x)
    (logits, feats), _ = jax.jit(lambda v, y, k: model.apply(
        v, y, train=True, mutable=["batch_stats"],
        rngs={"dropout": k}))(variables, x, jax.random.PRNGKey(2))
    assert logits.shape == (1, 16, 16, 16, 2)
    assert feats.shape[-1] == 4


def test_unet3d_dtc_two_heads():
    """`UNet_DTC.forward` (`Unet3D.py:171-178`): flat (out_tanh, out_seg),
    tanh head first."""
    model = create_model("unet_3D_dtc", class_num=2,
                         feat_channels=(4, 8, 8, 16, 32))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    variables = jinit(model, x)
    out_tanh, out_seg = japply(model, variables, x)
    assert out_tanh.shape == out_seg.shape == (1, 16, 16, 16, 2)
    assert float(jnp.abs(out_tanh).max()) <= 1.0


def test_unet3d_nonresidual_param_reduction():
    kw = dict(n_classes=2, feat_channels=(4, 8, 8, 16, 32))
    x = jnp.zeros((1, 16, 16, 16, 1))
    n = {}
    for res in (True, False):
        m = UNet3D(residual=res, **kw)
        v = jax.eval_shape(
            lambda r, y: m.init(r, y, train=False),
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x)
        n[res] = sum(int(np.prod(p.shape))
                     for p in jax.tree_util.tree_leaves(v["params"]))
    assert n[True] > n[False]  # 1x1 residual adapters add params


@pytest.fixture(scope="module")
def unetr_and_vars():
    # patch_size stays 16: the decoder's four upsampling stages are tied
    # to it (reference unetr.py is patch-16 only). Non-cubic 32x16x16 keeps
    # a 2-token grid so attention still mixes tokens, at 1/8 the voxels.
    model = UNETR(img_shape=(32, 16, 16), n_classes=2, embed_dim=32,
                  patch_size=16, num_heads=2, num_layers=4,
                  d_ff=64, ext_layers=(1, 2, 3, 4), width_scale=0.125)
    return model, jinit(model, jnp.zeros((1, 32, 16, 16, 1)))


def test_unetr_forward(unetr_and_vars):
    model, variables = unetr_and_vars
    x = jnp.zeros((1, 32, 16, 16, 1))
    logits, z0 = japply(model, variables, x)
    assert logits.shape == (1, 32, 16, 16, 2)
    # position embeddings sized to the token count (2x1x1 patches)
    pos = variables["params"]["position_embeddings"]
    assert pos.shape == (1, 2, 32)


def test_unetr_train_mode_runs(unetr_and_vars):
    model, variables = unetr_and_vars
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16, 16, 1))
    (logits, _), updates = jax.jit(lambda v, y, k: model.apply(
        v, y, train=True, mutable=["batch_stats"],
        rngs={"dropout": k}))(variables, x, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(logits)).all()


def test_unetr_dtc_two_heads():
    """`UNETR_DTC` (`networks/unetr.py:296-407`): (out_tanh, out_seg)."""
    model = create_model("unetr_dtc", class_num=2,
                         img_shape=(32, 16, 16), embed_dim=32,
                         patch_size=16, num_heads=2, num_layers=4,
                         d_ff=64, ext_layers=(1, 2, 3, 4),
                         width_scale=0.125)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16, 16, 1))
    variables = jinit(model, x)
    out_tanh, out_seg = japply(model, variables, x)
    assert out_tanh.shape == out_seg.shape == (1, 32, 16, 16, 2)
    assert float(jnp.abs(out_tanh).max()) <= 1.0          # tanh head
    assert float(jnp.abs(out_seg).max()) > 0.0


def test_git_vnet_factory_key():
    """`git_VNet.VNet` (`networks/git_VNet.py:145-240`) maps onto VNet3D
    (identical topology; normalization defaults to 'none')."""
    model = create_model("git_VNet", class_num=2)
    assert model.normalization == "none" and not model.has_dropout
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = jinit(model, x)
    logits, _ = japply(model, variables, x)
    assert logits.shape == (1, 16, 16, 16, 2)


def test_zoo_registered():
    from bcp_tpu.models import MODEL_REGISTRY
    for name in ("unet", "VNet", "VNet_pancreas", "unet_3D",
                 "unet_3D_dtc", "unetr", "unetr_dtc", "git_VNet",
                 "sep_unet_2d", "unet_2d_bcp", "unet_tsne", "net_D",
                 "unet_3D_trilinear"):
        assert name in MODEL_REGISTRY


# ---------------------------------------------------------------------------
# dead-net tail of networks/unet.py (C7 footnote: Sep_UNet_2d, net_D +
# GradReverse, UNet_2dBCP, UNet_tsne, trilinear UNet_3D)


def _n_params(tree):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(tree))


def _torch_n_params(tmodel):
    return sum(p.numel() for p in tmodel.parameters())


@pytest.fixture(scope="module")
def ref_unet():
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_unet_zoo", "/root/reference/code/networks/unet.py")
    mod = importlib.util.module_from_spec(spec)
    import sys
    sys.modules["ref_unet_zoo"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_sep_unet_2d_forward_and_param_parity(ref_unet):
    """`Sep_UNet_2d` (`unet.py:259-316`): (pooled feature, logits) out,
    and the flax port's parameter count matches the torch original
    exactly (body + projection/prediction + 2x4 selectors)."""
    from bcp_tpu.models.unet_extras import SepUNet2D
    model = SepUNet2D(n_classes=4, feature_chns=(2, 4, 4, 8, 8),
                      feat_dim=4)
    # 112^2 -> 7^2 bottleneck -> two 3x3/2 VALID pools -> 3^2 -> 1^2
    # (at the reference's 256^2: 16 -> 7 -> 3, net_D's 3x3 feature)
    x = jnp.zeros((2, 112, 112, 1))
    feats = jnp.zeros((2, 2))   # dim_in = ft[0]

    def full(m, x, f):
        return m(x, train=False), m.init_heads(f, train=False)

    variables = jax.jit(lambda r, x, f: model.init(r, x, f, method=full))(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, feats)
    (feature, logits), _ = jax.jit(
        lambda v, x, f: model.apply(v, x, f, method=full))(
        variables, x, feats)
    assert logits.shape == (2, 112, 112, 4)
    assert feature.shape == (2, 1, 1, 8)

    # param-count parity at the reference's real ladder, via eval_shape
    big = SepUNet2D(n_classes=4)
    shapes = jax.eval_shape(
        lambda r, x, f: big.init(r, x, f, method=full),
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 256, 256, 1)), jnp.zeros((1, 16)))
    tref = ref_unet.Sep_UNet_2d(in_chns=1, class_num=4)
    assert _n_params(shapes["params"]) == _torch_n_params(tref)


def test_unet_2d_bcp_and_tsne(ref_unet):
    """`UNet_2dBCP` (logits only) and `UNet_tsne` ((logits, x_last) +
    heads), with torch param-count parity for both."""
    from bcp_tpu.models.unet_extras import UNet2DBCP, UNetTsne
    x = jnp.zeros((1, 32, 32, 1))
    bcp = UNet2DBCP(n_classes=4, feature_chns=(2, 4, 4, 8, 8))
    v = jinit(bcp, x)
    out = japply(bcp, v, x)
    assert out.shape == (1, 32, 32, 4)       # single output

    tsne = UNetTsne(n_classes=4, feature_chns=(2, 4, 4, 8, 8), feat_dim=4)

    def full(m, x, f):
        return m(x, train=False), m.init_heads(f, train=False)

    feats = jnp.zeros((2, 2))
    vt = jax.jit(lambda r, x, f: tsne.init(r, x, f, method=full))(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, feats)
    (logits, x_last), _ = jax.jit(
        lambda v, x, f: tsne.apply(v, x, f, method=full))(vt, x, feats)
    assert logits.shape == (1, 32, 32, 4)
    assert x_last.shape == (1, 32, 32, 2)

    shapes = jax.eval_shape(
        lambda r, y: UNet2DBCP(n_classes=4).init(r, y, train=False),
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))
    assert (_n_params(shapes["params"])
            == _torch_n_params(ref_unet.UNet_2dBCP(1, 4)))

    shapes = jax.eval_shape(
        lambda r, x, f: UNetTsne(n_classes=4).init(r, x, f, method=full),
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 256, 256, 1)), jnp.zeros((1, 16)))
    assert (_n_params(shapes["params"])
            == _torch_n_params(ref_unet.UNet_tsne(1, 4)))


def test_net_d_shapes_and_param_parity(ref_unet):
    """`net_D` (`unet.py:341-359`): whole-batch flatten -> sigmoid scalar;
    param count matches torch at b_size=1 (the torch Linear ladder)."""
    from bcp_tpu.models.unet_extras import NetD
    model = NetD(b_size=1)
    x = jnp.zeros((1, 3, 3, 256))
    v = jinit(model, x)
    out = japply(model, v, x)
    assert out.shape == (1, 1)
    assert 0.0 <= float(out[0, 0]) <= 1.0
    assert _n_params(v["params"]) == _torch_n_params(ref_unet.net_D(1))


def test_grad_reverse_vjp():
    """GradReverse (`unet.py:318-331`): identity forward, -lambda-scaled
    gradient — the optax-compatible custom_vjp version."""
    from bcp_tpu.models.unet_extras import grad_reverse
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(np.asarray(grad_reverse(x, 2.0)),
                                  np.asarray(x))
    g = jax.grad(lambda x: jnp.sum(grad_reverse(x, 2.0) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(-2.0 * 2.0 * x),
                               rtol=1e-6)


def test_resize_trilinear_matches_torch():
    """jax.image.resize(method='trilinear') == torch interpolate
    (mode='trilinear', align_corners=False) — both half-pixel."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from bcp_tpu.models.unet_extras import resize_trilinear
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 5, 2)).astype(np.float32)  # NDHWC
    ours = np.asarray(resize_trilinear(jnp.asarray(x), (2, 2, 2)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                        scale_factor=(2, 2, 2), mode="trilinear",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_unet_3d_trilinear_forward_and_param_parity(ref_unet):
    """Trilinear `UNet_3D` (`unet.py:435-510`): 4 softmaxed
    deep-supervision maps at (D, 2H, 2W) in train mode, map4 in eval;
    torch param-count parity at the reference ladder."""
    from bcp_tpu.models.unet_extras import UNet3DTrilinear
    model = UNet3DTrilinear(n_classes=2, feat=(2, 4, 4, 8))
    x = jnp.zeros((1, 16, 32, 32, 1))
    v = jinit(model, x)
    out4 = japply(model, v, x)
    assert out4.shape == (1, 16, 64, 64, 2)
    maps = jax.jit(lambda v, y: model.apply(v, y, train=True))(v, x)
    assert len(maps) == 4
    for m in maps:
        assert m.shape == (1, 16, 64, 64, 2)
        np.testing.assert_allclose(np.asarray(m).sum(-1), 1.0, rtol=1e-4)

    shapes = jax.eval_shape(
        lambda r, y: UNet3DTrilinear(n_classes=2).init(r, y, train=False),
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, jnp.zeros((1, 16, 32, 32, 1)))
    assert (_n_params(shapes["params"])
            == _torch_n_params(ref_unet.UNet_3D(1, 2)))
