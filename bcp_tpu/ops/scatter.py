"""Pallas TPU kernel: windowed scatter-add for sliding-window inference.

The eval engine accumulates per-window softmax maps into the volume score
map (`utils/test_3d_patch.py:132-135` does this on host numpy; here it is
device-resident). The XLA lowering — dynamic_slice + dynamic_update_slice
per window — measures ~22 ms per 16-window chunk at LA shapes because the
window offsets (stride 18/18/4) are unaligned with the vector tiling, so
every read-modify-write relayouts a 16 MB tile in HBM.

Kernel design (alignment-aware):

- the score map is viewed as (X, Y, Z*C), so the two tiled dims
  (sublane = Y, lane = Z*C) are always copied at FULL extent — DMA slices
  touch only the outer X axis, which has no alignment constraint
  (Mosaic rejects sub-tile slices on lane/sublane axes);
- grid = (window, x-slab): each step DMAs an (XT, Y, Z*C) slab of the
  score map into VMEM, builds the update by placing the probs block at a
  static origin and ``pltpu.roll``-ing it to its dynamic (y, z*C) offset
  (windows always fit, so nothing wraps), adds, and DMAs back;
- the TPU grid executes sequentially, so overlapping windows stay
  correctly ordered read-after-write.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x-rows of the window processed per grid step
_XT = 8
_VMEM_LIMIT_BYTES = 6 * 1024 * 1024


def pallas_supported(probs_shape, score_shape) -> bool:
    """x extent must tile; the full-(Y, Z*C) slab must fit VMEM twice
    (slab + update); the rolled axes must match the vector tiling
    (sublane Y % 8, lane Z*C % 128 — ``dynamic_rotate`` requires it)."""
    _, px, py, pz, c = probs_shape
    _, y, z, c2 = score_shape
    slab_bytes = _XT * y * z * c * 4
    return (px % _XT == 0
            and y % 8 == 0
            and (z * c) % 128 == 0
            and 2 * slab_bytes <= _VMEM_LIMIT_BYTES)


def _kernel(starts_ref, probs_ref, _score_in, score_out, vmem,
            sem_in, sem_out):
    w = pl.program_id(0)
    i = pl.program_id(1)
    sx = starts_ref[w, 0] + i * _XT
    sy = starts_ref[w, 1]
    szc = starts_ref[w, 2]          # pre-multiplied by C on the host side
    xt, y, zc = vmem.shape
    dst = score_out.at[pl.ds(sx, xt)]
    load = pltpu.make_async_copy(dst, vmem, sem_in)
    load.start()

    # build the update slab: probs block padded to the slab extent
    # (static), then rolled to its dynamic (y, z*C) offset
    _, _, py, pzc = probs_ref.shape
    update = jnp.pad(probs_ref[0].astype(vmem.dtype),
                     ((0, 0), (0, y - py), (0, zc - pzc)))
    update = pltpu.roll(update, sy, 1)
    update = pltpu.roll(update, szc, 2)

    load.wait()
    vmem[:] = vmem[:] + update
    store = pltpu.make_async_copy(vmem, dst, sem_out)
    store.start()
    store.wait()


@partial(jax.jit, donate_argnums=(0,))
def scatter_add_windows(score: jax.Array, probs: jax.Array,
                        starts: jax.Array) -> jax.Array:
    """score[(sx:sx+px, sy:sy+py, sz:sz+pz), :] += probs[w] for each
    window w with origin starts[w]. score (X,Y,Z,C) f32, probs
    (B,px,py,pz,C) f32, starts (B,3) int32."""
    b, px, py, pz, c = probs.shape
    x, y, z, _ = score.shape
    score2 = score.reshape(x, y, z * c)
    probs2 = probs.reshape(b, px, py, pz * c)
    starts2 = starts * jnp.array([1, 1, c], starts.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, px // _XT),
        in_specs=[
            pl.BlockSpec((1, _XT, py, pz * c),
                         lambda w, i, s: (w, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # score stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((_XT, y, z * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(score2.shape, score2.dtype),
        input_output_aliases={2: 0},   # (starts, probs, score) -> score
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(starts2, probs2, score2)
    return out.reshape(score.shape)
