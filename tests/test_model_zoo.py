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
                 "unet_3D_dtc", "unetr", "unetr_dtc", "git_VNet"):
        assert name in MODEL_REGISTRY
