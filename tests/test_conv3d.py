"""Pallas 3^3 conv kernel vs the numpy oracle (interpret mode on CPU).

The kernel itself targets TPU; interpret mode checks the math — tiling,
halo handling, the z block-Toeplitz weight expansion, and both custom-VJP
branches (`ops/conv3d.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcp_tpu.ops import conv3d


def _case(B, X, Y, Z, Ci, Co, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, X, Y, Z, Ci)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 3, Ci, Co)) * 0.1).astype(np.float32)
    return x, w


@pytest.mark.parametrize("shape", [
    (1, 4, 8, 8, 16, 16),     # single z tile, G=8
    (2, 4, 8, 16, 16, 16),    # two z tiles
    (1, 4, 8, 8, 32, 16),     # Ci != Co
    (1, 2, 8, 4, 32, 32),     # G=4, single tile
])
def test_pallas_conv_matches_oracle(shape):
    B, X, Y, Z, Ci, Co = shape
    x, w = _case(B, X, Y, Z, Ci, Co)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)
    assert tiles is not None, "expected a tile plan for this shape"
    out = conv3d.conv3x3x3_same(jnp.asarray(x), jnp.asarray(w), tiles,
                                True)
    ref = conv3d.reference_conv3x3x3(x, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                               atol=2e-5)


def test_pallas_conv_grads_match_direct():
    x, w = _case(1, 4, 8, 8, 16, 16)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)

    def loss_p(x, w):
        return (conv3d.conv3x3x3_same(x, w, tiles, True) ** 2).sum()

    def loss_d(x, w):
        return (conv3d._direct(x, w) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gd = jax.grad(loss_d, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_tile_plan_rejects_unalignable_shapes():
    # Ci not a divisor of the 128-lane granule
    assert conv3d.pallas_conv_tiles((1, 4, 8, 8, 48), (3, 3, 3, 48, 48)) \
        is None
    # Z not divisible by the z group
    assert conv3d.pallas_conv_tiles((1, 4, 8, 5, 16), (3, 3, 3, 16, 16)) \
        is None


def test_merged_conv_matches_oracle():
    B, X, Y, Z, Ci, Co = 2, 4, 8, 8, 16, 16
    x, w = _case(B, X, Y, Z, Ci, Co)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)
    xm = conv3d.merge_zc(jnp.asarray(x))
    ym = conv3d.conv3x3x3_merged(xm, jnp.asarray(w), Z, tiles, True)
    out = conv3d.unmerge_zc(ym, Z)
    ref = conv3d.reference_conv3x3x3(x, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                               atol=2e-5)


def test_merged_conv_grads_match_direct():
    B, X, Y, Z, Ci, Co = 1, 4, 8, 8, 16, 16
    x, w = _case(B, X, Y, Z, Ci, Co)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)

    def loss_m(x, w):
        ym = conv3d.conv3x3x3_merged(conv3d.merge_zc(x), w, Z, tiles,
                                     True)
        return (conv3d.unmerge_zc(ym, Z) ** 2).sum()

    def loss_d(x, w):
        return (conv3d._direct(x, w) ** 2).sum()

    gm = jax.grad(loss_m, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gd = jax.grad(loss_d, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    for a, b in zip(gm, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("co", [16, 32])
def test_pallas_dw_matches_direct_vjp(co):
    B, X, Y, Z, Ci = 1, 4, 8, 8, 16
    x, w = _case(B, X, Y, Z, Ci, co)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)
    dy = np.random.default_rng(1).normal(
        size=(B, X, Y, Z, co)).astype(np.float32)

    dw_k = conv3d._conv3x3x3_dw_pallas(
        conv3d.merge_zc(jnp.asarray(x)),
        conv3d.merge_zc(jnp.asarray(dy)), Z, Ci, tiles[0], tiles[1],
        True)
    _, vjp = jax.vjp(lambda wv: conv3d._direct(jnp.asarray(x), wv),
                     jnp.asarray(w))
    dw_d, = vjp(jnp.asarray(dy))
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_d),
                               rtol=2e-4, atol=2e-4)


def test_packed_domain_dw_matches_direct_vjp():
    # Opt-in BCP_DW_PACKED path (layers._dw_via_packed): the weight grad
    # computed by transposing the *packed* forward and folding the
    # block-Toeplitz placements back must equal the direct conv VJP.
    # (Kept opt-in: the XLA-TPU compile of the full train step with this
    # path did not terminate — DESIGN.md "Negative results".)
    from bcp_tpu.models import layers
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 6, 6, 16, 16), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, 16, 16), jnp.float32) * 0.1
    dy = jax.random.normal(k3, (2, 6, 6, 16, 16), jnp.float32)
    dw_new = layers._dw_via_packed(x, dy, 8, w.shape)
    _, vjp = jax.vjp(lambda wv: conv3d._direct(x, wv), w)
    dw_direct, = vjp(dy)
    np.testing.assert_allclose(np.asarray(dw_new), np.asarray(dw_direct),
                               rtol=2e-4, atol=2e-4)


def test_merged_norms_match_unmerged():
    from bcp_tpu.models.layers import TorchBatchNorm, instance_norm
    key = jax.random.PRNGKey(0)
    Z = 8
    x = jax.random.normal(key, (4, 6, 8, Z, 16), jnp.float32)
    xm = conv3d.merge_zc(x)
    bn = TorchBatchNorm(groups=2)
    v = bn.init(key, x, False)
    y1, m1 = bn.apply(v, x, False, mutable=["batch_stats"])
    y2m, m2 = bn.apply(v, xm, False, merged_z=Z,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1),
                               np.asarray(conv3d.unmerge_zc(y2m, Z)),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m1["batch_stats"][k]),
                                   np.asarray(m2["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)
    y1e = bn.apply(v, x, True)
    y2e = conv3d.unmerge_zc(bn.apply(v, xm, True, merged_z=Z), Z)
    np.testing.assert_allclose(np.asarray(y1e), np.asarray(y2e),
                               rtol=1e-6, atol=1e-6)
    i1 = instance_norm(x)
    i2 = conv3d.unmerge_zc(instance_norm(xm, merged_z=Z), Z)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2),
                               rtol=1e-5, atol=1e-5)


def test_merged_stage_matches_unmerged_model(monkeypatch):
    """Whole ConvStage through the merged chain (interpret kernels) ==
    the unmerged z-packed path, params identical (checkpoint compat)."""
    import bcp_tpu.models.vnet3d as v3

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 8, 8, 16), jnp.float32)
    stage = v3.ConvStage(2, 16, "batchnorm")
    params = stage.init(key, x, False)

    y_ref, _ = stage.apply(params, x, True, mutable=["batch_stats"])

    # force the merged path on CPU: interpret-mode kernels
    monkeypatch.setattr(v3, "_stage_merged_z",
                        lambda xx, f, n: xx.shape[3])
    orig_merged = conv3d.conv3x3x3_merged
    monkeypatch.setattr(
        conv3d, "conv3x3x3_merged",
        lambda xm, w, z, tiles, interpret=False:
        orig_merged(xm, w, z, tiles, True))
    y_m, _ = stage.apply(params, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


# -- real-TPU guard (skipped on CPU CI; runs whenever a TPU is attached) --
#
# Decision recorded in DESIGN.md: the Pallas conv/dw kernels stay in-tree
# as development infrastructure for the opt-in merged-chain path
# (BCP_MERGED_CHAINS=1) — these tests keep them exact on the actual
# Mosaic compiler, not just interpret mode.

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="real-TPU Mosaic compile required")


@tpu_only
def test_pallas_conv_matches_oracle_on_tpu():
    x, w = _case(2, 4, 8, 16, 16, 16, seed=3)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)
    assert tiles is not None
    out = conv3d.conv3x3x3_same(jnp.asarray(x, jnp.float32),
                                jnp.asarray(w, jnp.float32), tiles)
    ref = conv3d.reference_conv3x3x3(x, w)
    # MXU default precision routes f32 matmuls through bf16 passes:
    # tolerance is bf16-input rounding of a K=432 dot (outputs O(1-5);
    # measured max |err| 0.022 on v5e)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=5e-2)


@tpu_only
def test_pallas_dw_matches_vjp_on_tpu():
    x, w = _case(1, 4, 8, 8, 16, 16, seed=4)
    rng = np.random.default_rng(5)
    dy = rng.normal(size=(1, 4, 8, 8, 16)).astype(np.float32)
    tiles = conv3d.pallas_conv_tiles(x.shape, w.shape)
    assert tiles is not None
    xm = conv3d.merge_zc(jnp.asarray(x))
    dym = conv3d.merge_zc(jnp.asarray(dy))
    got = conv3d._conv3x3x3_dw_pallas(xm, dym, x.shape[3], 16,
                                      tiles[0], tiles[1])
    _, vjp = jax.vjp(lambda wv: conv3d._direct(jnp.asarray(x), wv),
                     jnp.asarray(w))
    ref, = vjp(jnp.asarray(dy))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [
    (1, 4, 8, 8, 16),      # G=8, single z tile
    (2, 4, 8, 16, 16),     # two z tiles
    (1, 2, 8, 8, 32),      # G=4
])
def test_fused_dxdw_matches_direct_vjp(shape):
    """The fused backward pair (one pallas_call, two outputs) ==
    XLA's conv VJP on both cotangents (interpret mode)."""
    B, X, Y, Z, C = shape
    x, w = _case(B, X, Y, Z, C, C)
    rng = np.random.default_rng(7)
    dy = rng.normal(size=(B, X, Y, Z, C)).astype(np.float32)
    tiles = conv3d.fused_bwd_eligible(x.shape, w.shape)
    assert tiles is not None
    dx, dw = conv3d.conv3x3x3_dxdw(jnp.asarray(x), jnp.asarray(dy),
                                   jnp.asarray(w), tiles,
                                   interpret=True)
    _, vjp = jax.vjp(lambda xv, wv: conv3d._direct(xv, wv),
                     jnp.asarray(x), jnp.asarray(w))
    dx_ref, dw_ref = vjp(jnp.asarray(dy))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_bwd_requires_equal_channels():
    assert conv3d.fused_bwd_eligible((1, 4, 8, 8, 32),
                                     (3, 3, 3, 32, 16)) is None
