"""Unit tests for bcp_tpu.ops.masks against the reference's documented
behaviour (`utils/BCP_utils.py:18-56`, `ACDC_BCP_train.py:131-164`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcp_tpu.ops import masks


def test_cuboid_mask_zero_fraction_3d():
    key = jax.random.PRNGKey(0)
    shape = (112, 112, 80)
    m = masks.cuboid_mask(key, shape, ratio=2 / 3)
    assert m.shape == shape
    assert m.dtype == jnp.int32
    expected_zeros = int(112 * 2 / 3) ** 2 * int(80 * 2 / 3)
    assert int((m == 0).sum()) == expected_zeros
    assert set(np.unique(np.asarray(m))) == {0, 1}


def test_cuboid_mask_zero_block_is_contiguous():
    m = np.asarray(masks.cuboid_mask(jax.random.PRNGKey(3), (24, 24, 16)))
    zs = np.argwhere(m == 0)
    lo, hi = zs.min(0), zs.max(0)
    block = m[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1]
    assert (block == 0).all()


def test_cuboid_mask_respects_bounds_small_shape():
    # The reference hardcodes 112/112/80 bounds; ours must track the shape.
    for seed in range(20):
        m = masks.cuboid_mask(jax.random.PRNGKey(seed), (30, 20, 10))
        assert int((np.asarray(m) == 0).sum()) == 20 * 13 * 6


def test_rect_mask_2d():
    m = masks.rect_mask(jax.random.PRNGKey(1), (256, 256))
    assert m.shape == (256, 256)
    assert int((m == 0).sum()) == int(256 * 2 / 3) ** 2


def test_fixed_cube_mask():
    m = masks.cuboid_mask_fixed(jax.random.PRNGKey(2), (96, 96, 96), 64)
    assert int((m == 0).sum()) == 64 ** 3


def test_grid_mask_2d_boxes_within_cells():
    m = np.asarray(masks.grid_mask(jax.random.PRNGKey(4), (243, 243),
                                   shrink=3))
    # 9 disjoint boxes of size int(243*2/9)=54 each.
    assert int((m == 0).sum()) == 9 * 54 * 54


def test_grid_mask_3d_reference_sizes_and_bounds():
    # `random_mask` (`BCP_utils.py:30-46`) at the real LA shape: box sizes
    # int(int(112*2/3)/3)+1 = 25 in x/y, int(int(80*2/3)/3) = 17 in z, and
    # offsets bounded by cell_end - size - 1 (randint hi exclusive).
    shape = (112, 112, 80)
    for seed in range(8):
        m = np.asarray(masks.grid_mask(jax.random.PRNGKey(seed), shape))
        assert int((m == 0).sum()) == 27 * 25 * 25 * 17
        # every zero-box stays >= 2 voxels clear of its cell end
        zeros = np.argwhere(m == 0)
        for d, (dim, size) in enumerate(zip(shape, (25, 25, 17))):
            cell = dim // 3
            for c in range(3):
                sel = zeros[(zeros[:, d] >= c * cell)
                            & (zeros[:, d] < (c + 1) * cell), d]
                if len(sel):
                    assert sel.max() <= (c + 1) * cell - 2


def test_slab_mask():
    m = np.asarray(masks.slab_mask(jax.random.PRNGKey(5), (112, 112, 81),
                                   axis=-1, fraction=8 / 27))
    z_zero = (m == 0).any(axis=(0, 1))
    assert int(z_zero.sum()) == int(81 * 8 / 27)
    # full slab: every (x, y) zeroed at those z
    assert (m[:, :, z_zero] == 0).all()


def test_mix_polarity():
    # mask==0 marks the pasted patch region: mix = a*mask + b*(1-mask).
    key = jax.random.PRNGKey(0)
    mask = masks.cuboid_mask(key, (8, 8, 8))
    a = jnp.ones((2, 8, 8, 8, 1))
    b = jnp.zeros((2, 8, 8, 8, 1))
    out = masks.mix(a, b, mask)
    np.testing.assert_array_equal(
        np.asarray(out[0, ..., 0]), np.asarray(mask).astype(np.float32))


def test_mix_label_broadcast():
    mask = masks.cuboid_mask(jax.random.PRNGKey(0), (8, 8))
    la = 3 * jnp.ones((4, 8, 8), jnp.int32)
    lb = jnp.ones((4, 8, 8), jnp.int32)
    out = masks.mix(la, lb, mask)
    assert out.shape == (4, 8, 8)
    assert set(np.unique(np.asarray(out))) == {1, 3}


def test_masks_are_jittable():
    f = jax.jit(lambda k: masks.cuboid_mask(k, (16, 16, 16)))
    m1 = f(jax.random.PRNGKey(0))
    m2 = f(jax.random.PRNGKey(1))
    assert m1.shape == (16, 16, 16)
    assert not np.array_equal(np.asarray(m1), np.asarray(m2))


def test_sample_mask_kinds():
    from bcp_tpu.config import la_config, acdc_config
    from bcp_tpu.train.steps import _sample_mask
    key = jax.random.PRNGKey(0)
    cfg3 = la_config().replace(patch_size=(27, 27, 27))
    # grid at 27^3: patch = int(27*2/3) = 18 -> sizes (7, 7, 6)
    for kind, expected_zeros in [
            ("ratio", 18 ** 3),
            ("fixed", None),
            ("grid", 27 * 7 * 7 * 6),
            ("slab", 27 * 27 * 8)]:
        m = _sample_mask(cfg3.replace(mask_kind=kind, mask_patch=9), key)
        assert m.shape == (27, 27, 27)
        if kind == "fixed":
            assert int((m == 0).sum()) == 9 ** 3
        elif expected_zeros is not None:
            assert int((m == 0).sum()) == expected_zeros
    cfg2 = acdc_config().replace(patch_size=(36, 36), mask_kind="slab")
    m = _sample_mask(cfg2, key)
    # contact_mask: rows slab of 4/9 of axis 0
    assert int((np.asarray(m) == 0).sum()) == 16 * 36
