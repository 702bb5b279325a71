"""Connected components + largest-CC NMS, on device.

The reference cleans teacher pseudo-labels with skimage's CPU
``label``/``bincount`` **every self-train iteration**, forcing a
device->host->device round-trip in the hot loop (`LA_BCP_train.py:65-77`,
`ACDC_BCP_train.py:89-109`, `pancreas/pancreas_utils.py:284-296`). Here the
whole NMS stays resident on TPU inside the jitted train step:

1. Seed every foreground voxel with a unique label (flat index + 1).
2. Iteratively propagate the *maximum* label through the foreground with a
   connectivity-shaped max-filter until a fixpoint (``lax.while_loop``) —
   after convergence every component carries one label. The max-filter is
   built from shifted ``jnp.maximum``s, a pure VPU pipeline.
3. Component sizes via one scatter-add histogram; keep the argmax component
   (ties resolve to the lowest label, like ``np.argmax(np.bincount(...))``).

Connectivity matches skimage's convention (``label(x, connectivity=c)``:
voxels are neighbours if they differ in at most ``c`` axes):
LA uses the skimage default = full (`LA_BCP_train.py:71`), pancreas uses
``connect_mode=2`` (`pancreas/pancreas_utils.py:289`), ACDC 2D uses the 2D
default = 2 (8-connectivity, `ACDC_BCP_train.py:99`).

A host-side exact fallback (scipy.ndimage) is in
``bcp_tpu.eval.metrics.host_largest_cc`` for offline evaluation parity.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _shift_max(x: jax.Array, axis: int) -> jax.Array:
    """max(x, x shifted +-1 along axis), zero-padded at the borders."""
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
    hi = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad_lo, pad_hi = list(pad), list(pad)
    pad_lo[axis] = (1, 0)
    pad_hi[axis] = (0, 1)
    fwd = jnp.pad(lo, pad_lo)   # neighbour at index-1
    bwd = jnp.pad(hi, pad_hi)   # neighbour at index+1
    return jnp.maximum(x, jnp.maximum(fwd, bwd))


def _neighbor_max(x: jax.Array, connectivity: int) -> jax.Array:
    """Max over the connectivity neighbourhood (including self)."""
    ndim = x.ndim
    if connectivity >= ndim:
        # Full box is separable: sweep each axis in turn.
        for ax in range(ndim):
            x = _shift_max(x, ax)
        return x
    if connectivity == 1:
        out = x
        for ax in range(ndim):
            out = jnp.maximum(out, _shift_max(x, ax))
        return out
    # 1 < connectivity < ndim (e.g. 18-connectivity in 3D): union of all
    # separable boxes over `connectivity`-sized axis subsets.
    out = x
    for axes in itertools.combinations(range(ndim), connectivity):
        box = x
        for ax in axes:
            box = _shift_max(box, ax)
        out = jnp.maximum(out, box)
    return out


def _axis_scan_max(lab: jax.Array, fg: jax.Array, axis: int) -> jax.Array:
    """Segmented cummax along ``axis`` in both directions: the maximum
    label floods an entire contiguous foreground run in one O(log n)
    associative scan, instead of one voxel per neighbour-max sweep.
    Labels never cross background (the scan resets at every background
    voxel), so propagation stays within components."""
    def comb(a, b):
        v1, r1 = a
        v2, r2 = b
        return jnp.where(r2, v2, jnp.maximum(v1, v2)), r1 | r2

    reset = ~fg
    fwd, _ = jax.lax.associative_scan((lambda a, b: comb(a, b)),
                                      (lab, reset), axis=axis)
    bwd, _ = jax.lax.associative_scan((lambda a, b: comb(a, b)),
                                      (lab, reset), axis=axis,
                                      reverse=True)
    return jnp.where(fg, jnp.maximum(fwd, bwd), 0)


@partial(jax.jit, static_argnames=("connectivity", "inner_steps",
                                   "jump_steps", "scan_steps"))
def connected_components(mask: jax.Array, connectivity: Optional[int] = None,
                         inner_steps: int = 16,
                         jump_steps: int = 0,
                         scan_steps: int = 0) -> jax.Array:
    """Label connected components of a binary mask (one sample, no batch).

    Returns int32 labels, 0 = background; component labels are arbitrary
    distinct positive ints.

    Each ``while_loop`` round runs ``inner_steps`` neighbour-max sweeps
    (hooking: labels flow one voxel along foreground paths; 16 sweeps
    per convergence check measured ~35% faster than 4 on v5e at LA
    shapes — the ``jnp.any`` fixpoint test costs a full-volume compare,
    so over-sweeping small diameters is cheaper than checking often)
    optionally followed by ``jump_steps`` pointer-jumping gathers
    (shortcutting:
    since every label is ``1 + flat index`` of a voxel in the same
    component, ``lab <- lab.flat[lab - 1]`` chases the chain toward the
    component maximum, doubling chain reach per gather — convergence in
    O(log diameter) rounds instead of O(diameter)).

    ``jump_steps`` defaults to 0 because large random gathers lower poorly
    on TPU (measured 143 ms vs 26 ms for the pure sweeps on a 112^3 LA
    mask on v5e); on CPU hosts the jumps are a ~4x win (601 ms vs 2101 ms
    on the same mask), so CPU callers may pass ``jump_steps=2``.

    ``scan_steps`` rounds of per-axis segmented cummax
    (``_axis_scan_max``) run after the sweeps: each floods labels along
    entire straight foreground runs, so convergence for a large convex
    component needs O(1) rounds instead of O(diameter / inner_steps) —
    sweep-only propagation on a batch of 8 smooth LA-sized masks
    measured 184 ms on v5e, where large components force many rounds.
    The convergence check still witnesses a full neighbour-max sweep
    with the true connectivity (the sweeps run first in each round), so
    the fixpoint is exact regardless of scan settings.

    Exactness (all modes): the neighbour max only moves labels between
    foreground neighbours, scans only flood within contiguous foreground
    runs, and a gathered label ``lab.flat[p]`` belongs to a voxel
    (``p``) already proven connected — so labels never escape their
    component, grow monotonically, and the fixpoint is the
    per-component maximum seed.
    """
    if connectivity is None:
        connectivity = mask.ndim
    fg = mask.astype(jnp.int32) > 0
    fg_flat = fg.ravel()
    seeds = (jnp.arange(1, mask.size + 1, dtype=jnp.int32)
             .reshape(mask.shape))
    labels = jnp.where(fg, seeds, 0)

    def propagate(lab):
        for _ in range(inner_steps):
            lab = jnp.where(fg, _neighbor_max(lab, connectivity), 0)
        for _ in range(scan_steps):
            for ax in range(mask.ndim):
                lab = _axis_scan_max(lab, fg, ax)
        flat = lab.ravel()
        for _ in range(jump_steps):
            parent = jnp.maximum(flat - 1, 0)
            flat = jnp.where(fg_flat, flat.take(parent), 0)
        return flat.reshape(lab.shape)

    def cond(state):
        lab, prev_changed = state
        return prev_changed

    def body(state):
        lab, _ = state
        new = propagate(lab)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return labels


def _mode_by_sort(flat: jax.Array) -> jax.Array:
    """Most frequent positive value (exact; ties -> lowest value, like
    ``np.argmax(np.bincount(...))``): sort + run-length pass (sort, find
    run boundaries, cummax the run-start positions, take the longest
    positive run) — ~40% faster on TPU than a scatter-add histogram over
    mask.size bins."""
    s = jnp.sort(flat)                      # zeros (background) first
    n = flat.size
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0))
    is_end = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
    run_size = idx - start_idx + 1
    cand = jnp.where(is_end & (s > 0), run_size, 0)
    # argmax picks the first maximal run; runs are sorted by label value,
    # so ties resolve to the lowest label, like the reference.
    return s[jnp.argmax(cand)]


def _propagation_steps() -> tuple:
    """(inner_steps, scan_steps) per backend. TPU: pure neighbour-max
    sweeps (scans' log-depth strided passes measured 1.5-7x slower at LA
    shapes on v5e). CPU: sweeps are miserable (22 s for one smooth
    112^3 mask) — two sweeps + one scan round converge in 0.5 s, a ~47x
    win, which also keeps the CPU-mesh test suite honest-fast."""
    if jax.default_backend() == "cpu":
        return 2, 1
    return 16, 0


@partial(jax.jit, static_argnames=("connectivity",))
def largest_cc(mask: jax.Array,
               connectivity: Optional[int] = None) -> jax.Array:
    """Keep only the largest connected component (one sample).

    Matches `LargestCC_pancreas` (`LA_BCP_train.py:65-77`): if the mask is
    empty it is returned unchanged; size ties resolve to the lowest label
    (like ``np.argmax(np.bincount(...))``).

    Selection is exact with a dominant-component fast path: the full-size
    sort + run-length pass over ``mask.size`` labels is ~3.5 ms/mask on
    v5e (most of the NMS cost), so first take the most frequent label of
    a 2x-strided subsample (8x cheaper sort) and count it exactly
    (elementwise compare + sum). If it covers a strict majority of the
    foreground, no other component can match it — it is provably the
    unique largest, so tie semantics cannot engage. Otherwise
    (multi-object or near-tie masks) fall back to the exact full-size
    pass inside a ``lax.cond``.
    """
    inner, scans = _propagation_steps()
    labels = connected_components(mask, connectivity,
                                  inner_steps=inner, scan_steps=scans)
    sub = labels[tuple(slice(None, None, 2) for _ in range(labels.ndim))]
    cand = _mode_by_sort(sub.ravel())
    n_cand = jnp.sum((labels == cand) & (cand > 0))
    fg_total = jnp.sum(labels > 0)
    dominant = n_cand * 2 > fg_total

    best_label = jax.lax.cond(
        dominant, lambda: cand, lambda: _mode_by_sort(labels.ravel()))
    keep = (labels == best_label) & (labels > 0)
    return keep.astype(jnp.int32)


def largest_cc_batch(masks: jax.Array,
                     connectivity: Optional[int] = None) -> jax.Array:
    """``largest_cc`` over a leading batch axis.

    Not a plain vmap of ``largest_cc``: a vmapped ``lax.cond`` lowers to
    ``select`` and executes *both* branches, which would pay the
    full-size sort even when every sample takes the dominant fast path.
    Instead the dominance test is hoisted to one batch-level scalar cond
    — the expensive exact fallback only runs if *some* sample lacks a
    strict-majority component (and then for the whole batch, which is
    still exact)."""
    B = masks.shape[0]
    inner, scans = _propagation_steps()
    labels = jax.vmap(
        lambda m: connected_components(m, connectivity,
                                       inner_steps=inner,
                                       scan_steps=scans))(masks)
    sub = labels[(slice(None),) + tuple(
        slice(None, None, 2) for _ in range(labels.ndim - 1))]
    cand = jax.vmap(_mode_by_sort)(sub.reshape(B, -1))
    bcast = cand.reshape((B,) + (1,) * (labels.ndim - 1))
    axes = tuple(range(1, labels.ndim))
    n_cand = jnp.sum((labels == bcast) & (bcast > 0), axis=axes)
    fg_total = jnp.sum(labels > 0, axis=axes)
    all_dominant = jnp.all(n_cand * 2 > fg_total)

    best = jax.lax.cond(
        all_dominant, lambda: cand,
        lambda: jax.vmap(_mode_by_sort)(labels.reshape(B, -1)))
    keep = (labels == best.reshape(bcast.shape)) & (labels > 0)
    return keep.astype(jnp.int32)


def largest_cc_per_class(seg: jax.Array, n_classes: int,
                         connectivity: Optional[int] = None) -> jax.Array:
    """Per-class largest-CC for multi-class 2D maps, batched.

    Matches `get_ACDC_2DLargestCC` (`ACDC_BCP_train.py:89-109`): for each
    class c in 1..n_classes-1 keep the largest component of ``seg == c``
    (empty classes pass through as zeros), then sum the per-class maps.
    """
    def one(sample):
        out = jnp.zeros_like(sample)
        for c in range(1, n_classes):
            binary = (sample == c).astype(jnp.int32)
            out = out + largest_cc(binary, connectivity) * c
        return out
    return jax.vmap(one)(seg)


def get_cut_mask(logits: jax.Array, thres: float = 0.5, nms: bool = False,
                 connectivity: Optional[int] = None) -> jax.Array:
    """Binary pseudo-label from channels-last logits ``(N, *S, 2)``.

    softmax class-1 prob >= thres, optionally largest-CC cleaned —
    `LA_BCP_train.py:57-63` / `pancreas/pancreas_utils.py:275-281`.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    masks = (probs[..., 1] >= thres).astype(jnp.int32)
    if nms:
        masks = largest_cc_batch(masks, connectivity)
    return masks


def get_multiclass_mask(logits: jax.Array, n_classes: int,
                        nms: bool = False,
                        connectivity: Optional[int] = None) -> jax.Array:
    """Argmax pseudo-label with optional per-class 2D largest-CC —
    `get_ACDC_masks` (`ACDC_BCP_train.py:112-117`)."""
    seg = jnp.argmax(jax.nn.softmax(logits, axis=-1), axis=-1)
    seg = seg.astype(jnp.int32)
    if nms:
        seg = largest_cc_per_class(seg, n_classes, connectivity)
    return seg
