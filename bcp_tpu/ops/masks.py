"""Copy-paste mask sampling.

TPU-native re-design of the reference's mask generators
(`code/utils/BCP_utils.py:18-56`, `code/ACDC_BCP_train.py:131-164`,
`code/pancreas/pancreas_utils.py:187-200`).

Design notes (vs the reference):

- Masks are sampled *inside* the jitted train step from a ``jax.random`` key
  instead of host-side ``np.random`` — no host->device transfer per step.
- Built from ``broadcasted_iota`` range comparisons rather than dynamic-slice
  writes: fully static shapes, trivially fusable by XLA into the mix +
  loss pipeline, and no scatter in the hot loop.
- Parameterised by the actual spatial shape. (The reference hardcodes the
  112/112/80 upper bounds in `context_mask`, `BCP_utils.py:23-25` — a latent
  bug when patch size changes; fixed here.)

Polarity convention (identical to the reference, `BCP_utils.py:26`):
``mask == 0`` marks the pasted *patch* region, ``mask == 1`` the kept
*image* region. The mixed input is ``a * mask + b * (1 - mask)``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _box_mask(spatial: Sequence[int], starts: Sequence[jax.Array],
              sizes: Sequence[int]) -> jax.Array:
    """0 inside the axis-aligned box [start, start+size) per dim, 1 outside."""
    inside = None
    for d, (dim, start, size) in enumerate(zip(spatial, starts, sizes)):
        coords = jax.lax.broadcasted_iota(jnp.int32, tuple(spatial), d)
        in_d = (coords >= start) & (coords < start + size)
        inside = in_d if inside is None else (inside & in_d)
    return 1 - inside.astype(jnp.int32)


def cuboid_mask(key: jax.Array, spatial: Sequence[int],
                ratio: float = 2.0 / 3.0) -> jax.Array:
    """Sample a single zero-cuboid (or zero-rect in 2D) copy-paste mask.

    Matches `context_mask` (`BCP_utils.py:18-28`) / `generate_mask`
    (`ACDC_BCP_train.py:131-140`): the zeroed patch spans ``int(dim*ratio)``
    per dimension, offset uniform in ``[0, dim - patch_dim)``.

    Returns an int32 mask of shape ``spatial`` (no batch dim — the reference
    shares one mask across the sub-batch; broadcast at use site).
    """
    spatial = tuple(int(s) for s in spatial)
    sizes = [int(s * ratio) for s in spatial]
    keys = jax.random.split(key, len(spatial))
    starts = [
        jax.random.randint(k, (), 0, dim - size)
        for k, dim, size in zip(keys, spatial, sizes)
    ]
    return _box_mask(spatial, starts, sizes)


def cuboid_mask_fixed(key: jax.Array, spatial: Sequence[int],
                      patch: int) -> jax.Array:
    """Fixed-size cube variant used by the pancreas pipeline.

    Matches `generate_mask` (`pancreas/pancreas_utils.py:187-200`): a
    ``patch``^3 cube zeroed at a uniform offset inside ``spatial`` (96^3 in
    the reference, parameterised here).
    """
    spatial = tuple(int(s) for s in spatial)
    sizes = [int(patch)] * len(spatial)
    keys = jax.random.split(key, len(spatial))
    starts = [
        jax.random.randint(k, (), 0, dim - size)
        for k, dim, size in zip(keys, spatial, sizes)
    ]
    return _box_mask(spatial, starts, sizes)


# `rect_mask` is the 2D alias; the math is dimension-generic.
rect_mask = cuboid_mask


def grid_mask(key: jax.Array, spatial: Sequence[int],
              shrink: int = 3) -> jax.Array:
    """Multi-box variant: one zero-box per cell of a shrink x shrink grid.

    Matches `random_mask` exactly in both arities:

    - 2D (`ACDC_BCP_train.py:142-154`): box of ``int(dim*2/(3*shrink))``
      per dim, offset uniform in ``[cell_start, cell_end - size)``.
    - 3D (`BCP_utils.py:30-46`): box sizes derive from the nested ints
      ``patch = int(dim*2/3)`` then ``int(patch/3) + 1`` in x/y but
      ``int(patch/3)`` (no +1) in z, and the offset upper bound carries an
      extra ``-1`` (``randint(lo, cell_end - size - 1)``, hi exclusive).
      The reference hardcodes shrink=3 there; other shrinks generalise the
      same formula.
    """
    spatial = tuple(int(s) for s in spatial)
    ndim = len(spatial)
    cell = [dim // shrink for dim in spatial]
    if ndim == 3:
        patch = [int(dim * 2 / 3) for dim in spatial]
        sizes = [patch[0] // shrink + 1, patch[1] // shrink + 1,
                 patch[2] // shrink]
        hi_extra = 1
    else:
        sizes = [int(dim * 2 / (3 * shrink)) for dim in spatial]
        hi_extra = 0
    mask = jnp.ones(spatial, jnp.int32)
    n_cells = shrink ** ndim
    keys = jax.random.split(key, n_cells * ndim)
    k = 0
    for flat in range(n_cells):
        idx = []
        rem = flat
        for _ in range(ndim):
            idx.append(rem % shrink)
            rem //= shrink
        starts = []
        for d in range(ndim):
            lo = idx[d] * cell[d]
            hi = (idx[d] + 1) * cell[d] - sizes[d] - hi_extra
            starts.append(jax.random.randint(keys[k], (), lo, hi))
            k += 1
        mask = mask * _box_mask(spatial, starts, sizes)
    return mask


def slab_mask(key: jax.Array, spatial: Sequence[int],
              axis: int = -1, fraction: float = 8.0 / 27.0) -> jax.Array:
    """Zero a full slab of ``int(dim*fraction)`` along one axis.

    Matches `concate_mask` (`BCP_utils.py:48-56`, z-slab of 8/27) and
    `contact_mask` (`ACDC_BCP_train.py:156-164`, row-slab of 4/9; pass
    ``axis=0, fraction=4/9`` for that variant).
    """
    spatial = tuple(int(s) for s in spatial)
    axis = axis % len(spatial)
    length = int(spatial[axis] * fraction)
    start = jax.random.randint(key, (), 0, spatial[axis] - length - 1)
    starts = [jnp.int32(0)] * len(spatial)
    sizes = list(spatial)
    starts[axis] = start
    sizes[axis] = length
    return _box_mask(spatial, starts, sizes)


def bbox_nd(mask: jax.Array) -> jax.Array:
    """Per-axis (min, max+1) bounds of the nonzero region, jittable.

    `get_bbox_3d` (`utils/BCP_utils.py:124-138`) semantics including the
    empty-mask fallback (min = max = 0, then max += 1).
    """
    ndim = mask.ndim
    nz = mask != 0
    any_at_all = nz.any()
    bounds = []
    for d in range(ndim):
        other = tuple(i for i in range(ndim) if i != d)
        occ = nz.any(axis=other)
        n = occ.shape[0]
        lo = jnp.argmax(occ)
        hi = n - 1 - jnp.argmax(occ[::-1])
        lo = jnp.where(any_at_all, lo, 0)
        hi = jnp.where(any_at_all, hi, 0)
        bounds.append(jnp.stack([lo, hi + 1]))
    return jnp.stack(bounds).astype(jnp.int32)


def bbox_mask(masks: jax.Array) -> jax.Array:
    """Batched: 0 inside each sample's nonzero bounding box, 1 outside —
    `get_bbox_mask` (`utils/BCP_utils.py:140-147`). masks (N, *spatial)."""
    spatial = masks.shape[1:]

    def one(m):
        b = bbox_nd(m)
        inside = None
        for d, dim in enumerate(spatial):
            coords = jax.lax.broadcasted_iota(jnp.int32, spatial, d)
            in_d = (coords >= b[d, 0]) & (coords < b[d, 1])
            inside = in_d if inside is None else (inside & in_d)
        return 1 - inside.astype(jnp.int32)

    return jax.vmap(one)(masks)


def mix(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """``a * mask + b * (1 - mask)`` with broadcasting over batch/channel.

    ``mask`` has shape ``spatial``; ``a``/``b`` are ``(N, *spatial)`` or
    ``(N, *spatial, C)`` (channels-last). Mirrors the mixing expressions in
    `LA_BCP_train.py:155,248-251` / `ACDC_BCP_train.py:247,372-373`.
    """
    m = mask.astype(a.dtype)
    if a.ndim == m.ndim + 2:        # (N, *spatial, C)
        m = m[None, ..., None]
    elif a.ndim == m.ndim + 1:      # (N, *spatial)
        m = m[None]
    return a * m + b * (1 - m)
