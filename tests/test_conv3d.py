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
