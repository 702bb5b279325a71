"""Pallas TPU kernel for low-channel 3^3 stride-1 SAME 3D convolution.

Why: the V-Net's hot convs have 16-64 channels at high spatial resolution
(`networks/VNet.py:145-186`). XLA's generic conv lowering runs these at
~4-5 TFLOPS on v5e (~2% of bf16 peak): the MXU sees K = 27*Cin but only
Cout of its 128 output lanes, and the spatial im2col streams through HBM.

Kernel design (per grid program; grid = (batch, x-tiles, z-tiles)):

  1. DMA an (Xt+2, Yp, Wz*Ci) halo tile HBM->VMEM. The (z, ci) dims are
     merged into the lane axis host-side: TPU HBM memrefs tile the last
     two dims (8, 128), so a separate Ci<128 lane dim would pad HBM 8x
     and make sub-128 DMA slices illegal; merged, the z-window slice
     [gz*Zt*Ci, Wz*Ci) is 128-lane aligned and compact.
  2. For each group of G = 128//Co consecutive output z-slices: stage the
     9 xy-shifted halo reads lane-concatenated into an im2col buffer
     A of shape (Xt*Y, 9*(G+2)*Ci) — 9 full-lane VMEM stores.
  3. ONE matmul A @ W computes the whole group: W is the z block-Toeplitz
     expansion of the 3^3 kernel, shape (9*(G+2)*Ci, G*Co) — the G
     output z-slices fill all 128 MXU output lanes (N = G*Co = 128)
     instead of the Co<=64 a direct lowering gets. The (z, ci) halo
     window lives in K, where the structural zeros only cost padded-K
     cycles. MXU utilisation cap (useful/padded MACs, bf16): Ci=Co=16:
     28%; 32: 48%; 64: 75%; 128: 100% — vs ~5-10% measured for XLA's
     lowering at these shapes.
  4. The f32 matmul result IS the (z', co)-merged output tile — no
     recombination pass; one store through the output BlockSpec (the
     caller splits (z, co) with a free XLA reshape).

Mosaic constraints that shaped this (discovered the hard way, v5e):
lane->sublane value reshapes are unsupported ("unsupported shape cast"),
tpu.concatenate cannot merge values with mismatched sublane offsets
(staging through a scratch ref renormalises), and HBM slices must be
(8, 128)-tile aligned in the last two dims.

Backward: dx reuses this same kernel with spatially-flipped, transposed
weights (a 3^3 SAME correlation is self-adjoint up to flips); dw falls
back to XLA's conv VJP — it is a weight-sized reduction where XLA's
lowering is already fine (same split as layers._zpacked_conv3d).

Used by ``models.layers.ZPackedConv3D`` when running on TPU with
tileable shapes; everything else falls back to the XLA lowerings.
Reference parity: this computes exactly `nn.Conv3d(k=3, s=1, p=1)`
(`networks/VNet.py:10-14`) up to bf16 reassociation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_lane(n: int) -> int:
    return int(math.ceil(n / _LANE) * _LANE)


def _round8(n: int) -> int:
    return int(math.ceil(n / 8) * 8)


def _zgroup(co: int) -> int:
    """Output z-slices per matmul: fill the 128 MXU lanes."""
    return max(1, _LANE // co)


def _z_window(zt: int, ci: int) -> int:
    """z extent of the DMA'd halo tile: >= Zt+2, rounded so the lane
    window Wz*Ci is a multiple of 128."""
    q = max(1, _LANE // ci)
    return int(math.ceil((zt + 2) / q) * q)


def _vmem_bytes(xt: int, y: int, zt: int, ci: int, co: int) -> int:
    """Rough VMEM footprint of one program (padded-lane accounting)."""
    yp = _round8(y + 2)
    wz = _z_window(zt, ci)
    g = _zgroup(co)
    tile = (xt + 2) * yp * _pad_lane(wz * ci) * 2
    a = xt * y * _pad_lane(9 * (g + 2) * ci) * 2
    w = 9 * (g + 2) * ci * _pad_lane(g * co) * 2
    out = xt * y * _pad_lane(zt * co) * 2 * 2   # double-buffered block
    return tile + a + w + out


def _choose_tiles(x: int, z: int, ci: int, co: int, y: int,
                  budget: int = 10 * 1024 * 1024
                  ) -> Optional[Tuple[int, int]]:
    """Pick (Xt, Zt): Zt a multiple of the z-group G and of the DMA
    alignment quantum q = 128//Ci, dividing Z; Xt dividing X. Maximise
    the matmul M = Xt*Y under the VMEM budget."""
    g = _zgroup(co)
    q = max(1, _LANE // ci)
    step = math.lcm(g, q)
    zts = [k * step for k in (4, 2, 1)
           if z % (k * step) == 0 and k * step <= z]
    if not zts:
        return None
    best = None
    for zt in zts:
        for xt in (16, 8, 4, 2, 1):
            if x % xt:
                continue
            if _vmem_bytes(xt, y, zt, ci, co) > budget:
                continue
            score = (xt * y, zt)
            if best is None or score > best[0]:
                best = (score, xt, zt)
    return None if best is None else (best[1], best[2])


def _make_kernel(Xt: int, Y: int, Yp: int, Zt: int, Wz: int, Ci: int,
                 Co: int, G: int):
    M2 = Xt * Y
    L0 = (G + 2) * Ci          # lanes per im2col piece
    n_groups = Zt // G

    def kernel(xp_ref, w_ref, out_ref, tile_ref, a_ref, sem):
        b = pl.program_id(0)
        gx = pl.program_id(1)
        gz = pl.program_id(2)
        copy = pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(gx * Xt, Xt + 2), slice(None),
                      pl.ds(gz * Zt * Ci, Wz * Ci)],
            tile_ref, sem)
        copy.start()
        copy.wait()
        for g in range(n_groups):
            base = g * G * Ci
            # 9 full-lane staging stores (Mosaic's concatenate cannot
            # merge values with mismatched sublane offsets, and lane ->
            # sublane reshapes are unsupported; a scratch ref store
            # renormalises the layout)
            for dx in range(3):
                for dy in range(3):
                    k = dx * 3 + dy
                    a_ref[:, :, k * L0:(k + 1) * L0] = \
                        tile_ref[dx:dx + Xt, dy:dy + Y,
                                 base:base + L0]
            a = a_ref[:].reshape(M2, 9 * L0)
            o = jnp.dot(a, w_ref[:],
                        preferred_element_type=jnp.float32)  # (M2, G*Co)
            out_ref[0, :, :, g * G * Co:(g + 1) * G * Co] = \
                o.reshape(Xt, Y, G * Co).astype(out_ref.dtype)

    return kernel


def _toeplitz_weights(w: jax.Array, G: int, dtype) -> jax.Array:
    """(3,3,3,Ci,Co) -> (9*(G+2)*Ci, G*Co): K rows indexed by
    (dx, dy, z_in, ci), N lanes by (z_out, co); nonzero where
    z_in - z_out in {0,1,2} (input z is output z + tap - 1 in halo
    coordinates)."""
    Ci, Co = w.shape[3], w.shape[4]
    wb = jnp.zeros((3, 3, G + 2, Ci, G, Co), w.dtype)
    for zo in range(G):
        wb = wb.at[:, :, zo:zo + 3, :, zo, :].add(w)
    return wb.reshape(9 * (G + 2) * Ci, G * Co).astype(dtype)


@functools.partial(jax.jit, static_argnames=("xt", "zt", "interpret"))
def _conv3x3x3_pallas(x: jax.Array, w: jax.Array, xt: int, zt: int,
                      interpret: bool = False) -> jax.Array:
    """x: (B, X, Y, Z, Ci), w: (3, 3, 3, Ci, Co) -> (B, X, Y, Z, Co)."""
    B, X, Y, Z, Ci = x.shape
    Co = w.shape[-1]
    G = _zgroup(Co)
    wz = _z_window(zt, Ci)
    yp = _round8(Y + 2)
    # halo padding: 1 voxel low; the high pad absorbs the aligned DMA
    # windows (the last z tile reads [Z - Zt, Z - Zt + Wz))
    zhi = wz - zt - 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, yp - Y - 1), (1, zhi), (0, 0)))
    xp = xp.reshape(B, X + 2, yp, xp.shape[3] * Ci)
    wmat = _toeplitz_weights(w, G, x.dtype)
    out = _pallas_call_merged(xp, wmat, Y, Z, Ci, Co, xt, zt, interpret)
    return out.reshape(B, X, Y, Z, Co)


def _pallas_call_merged(xp: jax.Array, wmat: jax.Array, Y: int, Z: int,
                        Ci: int, Co: int, xt: int, zt: int,
                        interpret: bool) -> jax.Array:
    """Core pallas_call on an already padded+merged input.

    xp: (B, X+2, Yp, Wz*Ci) halo-padded with the (z, ci) dims merged into
    lanes; wmat: the z block-Toeplitz weight expansion. Returns the
    merged output (B, X, Y, Z*Co)."""
    B, Xp2, yp, _ = xp.shape
    X = Xp2 - 2
    G = _zgroup(Co)
    wz = _z_window(zt, Ci)
    kernel = _make_kernel(xt, Y, yp, zt, wz, Ci, Co, G)
    flops = 2 * B * X * Y * Z * 27 * Ci * Co
    return pl.pallas_call(
        kernel,
        grid=(B, X // xt, Z // zt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, xt, Y, zt * Co),
            lambda b, i, k: (b, i, 0, k),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z * Co), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((xt + 2, yp, wz * Ci), xp.dtype),
            pltpu.VMEM((xt, Y, 9 * (G + 2) * Ci), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, wmat)


def pallas_conv_tiles(x_shape, w_shape) -> Optional[Tuple[int, int]]:
    """Tile plan for ``conv3x3x3_same`` on these shapes, or None if the
    kernel does not apply (alignment / non-tileable extents)."""
    if len(x_shape) != 5 or tuple(w_shape[:3]) != (3, 3, 3):
        return None
    B, X, Y, Z, Ci = x_shape
    Co = w_shape[-1]
    if Ci != w_shape[3] or Ci > 256 or Co > 256:
        return None
    # merged-lane layouts require 128 % Ci == 0 (or Ci % 128 == 0) and
    # the same for Co; Y must be sublane-aligned
    if Ci % 16 or Co % 16 or Y % 8:
        return None
    if (Ci < _LANE and _LANE % Ci) or (Co < _LANE and _LANE % Co):
        return None
    if X < 2 or Z < 2:
        return None
    return _choose_tiles(X, Z, Ci, Co, Y)


@functools.partial(jax.jit,
                   static_argnames=("z", "xt", "zt", "interpret"))
def _conv3x3x3_pallas_merged(xm: jax.Array, w: jax.Array, z: int,
                             xt: int, zt: int,
                             interpret: bool = False) -> jax.Array:
    """Merged-layout entry: xm (B, X, Y, Z*Ci) with lanes ordered
    (z, ci); returns (B, X, Y, Z*Co) lanes (z, co). The z halo pad is a
    lane-dim pad of Ci low / (Wz-Zt-1)*Ci high — one fused XLA pad, no
    (z, c) split/merge relayout anywhere in the chain."""
    B, X, Y, ZCi = xm.shape
    Ci = ZCi // z
    Co = w.shape[-1]
    G = _zgroup(Co)
    wz = _z_window(zt, Ci)
    yp = _round8(Y + 2)
    zhi = wz - zt - 1
    xp = jnp.pad(xm, ((0, 0), (1, 1), (1, yp - Y - 1),
                      (Ci, zhi * Ci)))
    wmat = _toeplitz_weights(w, G, xm.dtype)
    return _pallas_call_merged(xp, wmat, Y, z, Ci, Co, xt, zt, interpret)


def _make_dw_kernel(Xt: int, Y: int, Yp: int, Zt: int, Wz: int, Ci: int,
                    Co: int, G: int):
    """Weight-grad kernel: same im2col staging as the forward, then
    acc += A^T @ dy_group. All grid programs map to the single output
    block, which therefore stays VMEM-resident across the whole grid
    (TPU grids run sequentially on one core)."""
    M2 = Xt * Y
    L0 = (G + 2) * Ci
    n_groups = Zt // G

    def kernel(xp_ref, dy_ref, out_ref, tile_ref, a_ref, sem):
        b = pl.program_id(0)
        gx = pl.program_id(1)
        gz = pl.program_id(2)

        @pl.when((b == 0) & (gx == 0) & (gz == 0))
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        copy = pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(gx * Xt, Xt + 2), slice(None),
                      pl.ds(gz * Zt * Ci, Wz * Ci)],
            tile_ref, sem)
        copy.start()
        copy.wait()
        for g in range(n_groups):
            base = g * G * Ci
            for dx in range(3):
                for dy in range(3):
                    k = dx * 3 + dy
                    a_ref[:, :, k * L0:(k + 1) * L0] = \
                        tile_ref[dx:dx + Xt, dy:dy + Y,
                                 base:base + L0]
            a = a_ref[:].reshape(M2, 9 * L0)
            dyg = dy_ref[0, :, :, g * G * Co:(g + 1) * G * Co] \
                .reshape(M2, G * Co)
            out_ref[...] += jax.lax.dot_general(
                a, dyg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


def _fold_toeplitz_grad(wg: jax.Array, G: int, Ci: int,
                        Co: int) -> jax.Array:
    """Adjoint of `_toeplitz_weights`: (9*(G+2)*Ci, G*Co) ->
    (3, 3, 3, Ci, Co) by summing the block-diagonal replicas."""
    wg = wg.reshape(3, 3, G + 2, Ci, G, Co)
    taps = []
    for kz in range(3):
        taps.append(sum(wg[:, :, zo + kz, :, zo, :] for zo in range(G)))
    return jnp.stack(taps, axis=2)


@functools.partial(jax.jit,
                   static_argnames=("z", "ci", "xt", "zt", "interpret"))
def _conv3x3x3_dw_pallas(xm: jax.Array, dym: jax.Array, z: int,
                         ci: int, xt: int, zt: int,
                         interpret: bool = False) -> jax.Array:
    """dw for the 3^3 SAME conv from merged-layout x and dy.

    xm: (B, X, Y, Z*Ci) lanes (z, ci); dym: (B, X, Y, Z*Co) lanes
    (z, co). Returns (3, 3, 3, Ci, Co) in f32. Replaces XLA's conv VJP
    for dw, which at low channel counts lowers to a full-res reduction
    fusion behind two layout copies (~14 ms of the LA train step for
    the 16-feature conv alone, measured in a profiler trace on v5e)."""
    B, X, Y, ZCi = xm.shape
    Ci = ci
    Co = dym.shape[-1] // z
    G = _zgroup(Co)
    wz = _z_window(zt, Ci)
    yp = _round8(Y + 2)
    zhi = wz - zt - 1
    xp = jnp.pad(xm, ((0, 0), (1, 1), (1, yp - Y - 1),
                      (Ci, zhi * Ci)))
    kernel = _make_dw_kernel(xt, Y, yp, zt, wz, Ci, Co, G)
    wg = pl.pallas_call(
        kernel,
        grid=(B, X // xt, z // zt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, xt, Y, zt * Co),
                               lambda b, i, k: (b, i, 0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (9 * (G + 2) * Ci, G * Co),
            lambda b, i, k: (0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (9 * (G + 2) * Ci, G * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((xt + 2, yp, wz * Ci), xm.dtype),
            pltpu.VMEM((xt, Y, 9 * (G + 2) * Ci), xm.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * X * Y * z * 9 * (G + 2) * Ci * G * Co // G,
            bytes_accessed=(xm.size + dym.size) * xm.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, dym)
    return _fold_toeplitz_grad(wg, G, Ci, Co)


def _make_dxdw_kernel(Xt: int, Y: int, Yp: int, Zt: int, Wz: int,
                      Ci: int, Co: int, G: int):
    """Fused backward: ONE grid pass emits both dx and the dw
    accumulator (round-4 verdict #3 — the one untried shape: the
    standalone Pallas dw kernel lost by fragmenting XLA's backward
    schedule at its boundary; pairing it with dx in the same
    ``pallas_call`` removes that boundary entirely).

    Requires Ci == Co (the V-Net level-1..3 stage convs), so the dx
    im2col over dy and the dw im2col over x share one tile geometry:

    - dx half == the forward kernel on the dy halo tile with the
      flipped/transposed weights' Toeplitz expansion;
    - dw half == ``A_x^T @ dy_center`` accumulated in a VMEM-resident
      block across the whole grid (sequential TPU grid);
    - dy is DMA'd once per step as a halo tile; its center (the clean
      dy block the dw matmul needs) is re-read through the output-z
      group loop of the *dx* im2col staging buffer, whose tap
      (dx=1, dy=1) holds exactly the center-shifted dy — no second
      HBM read and no unaligned lane slice of the halo tile.
    """
    M2 = Xt * Y
    L0 = (G + 2) * Ci          # lanes per im2col piece (Ci == Co)
    k_ctr = 4                  # tap (dx=1, dy=1): the unshifted copy
    n_groups = Zt // G

    def kernel(xp_ref, dyp_ref, wt_ref, dx_ref, dwg_ref,
               xtile_ref, dytile_ref, ax_ref, ady_ref, sem_x, sem_dy):
        b = pl.program_id(0)
        gx = pl.program_id(1)
        gz = pl.program_id(2)

        @pl.when((b == 0) & (gx == 0) & (gz == 0))
        def _init():
            dwg_ref[...] = jnp.zeros_like(dwg_ref)

        cx = pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(gx * Xt, Xt + 2), slice(None),
                      pl.ds(gz * Zt * Ci, Wz * Ci)],
            xtile_ref, sem_x)
        cdy = pltpu.make_async_copy(
            dyp_ref.at[b, pl.ds(gx * Xt, Xt + 2), slice(None),
                       pl.ds(gz * Zt * Ci, Wz * Ci)],
            dytile_ref, sem_dy)
        cx.start()
        cdy.start()
        cx.wait()
        cdy.wait()
        for g in range(n_groups):
            base = g * G * Ci
            for dx in range(3):
                for dy in range(3):
                    k = dx * 3 + dy
                    ax_ref[:, :, k * L0:(k + 1) * L0] = \
                        xtile_ref[dx:dx + Xt, dy:dy + Y, base:base + L0]
                    ady_ref[:, :, k * L0:(k + 1) * L0] = \
                        dytile_ref[dx:dx + Xt, dy:dy + Y,
                                   base:base + L0]
            a_dy = ady_ref[:].reshape(M2, 9 * L0)
            dxo = jnp.dot(a_dy, wt_ref[:],
                          preferred_element_type=jnp.float32)
            dx_ref[0, :, :, g * G * Ci:(g + 1) * G * Ci] = \
                dxo.reshape(Xt, Y, G * Ci).astype(dx_ref.dtype)
            # dy center block for dw: z slices [g*G, g*G+G) at z offset
            # +1 into the halo window == lanes [Ci, (G+1)*Ci) of the
            # center tap's L0 block
            a_x = ax_ref[:].reshape(M2, 9 * L0)
            dyg = ady_ref[:, :, k_ctr * L0 + Ci:
                          k_ctr * L0 + (G + 1) * Ci].reshape(M2, G * Ci)
            dwg_ref[...] += jax.lax.dot_general(
                a_x, dyg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("z", "xt", "zt", "interpret"))
def _conv3x3x3_dxdw_pallas(xm: jax.Array, dym: jax.Array, w: jax.Array,
                           z: int, xt: int, zt: int,
                           interpret: bool = False):
    """Fused (dx, dw) for the 3^3 SAME conv, merged layouts, Ci == Co.

    xm, dym: (B, X, Y, Z*C) lanes (z, c). Returns (dxm (B, X, Y, Z*C),
    dw (3, 3, 3, C, C) f32). One pallas_call, two outputs."""
    B, X, Y, ZC = xm.shape
    Ci = ZC // z
    Co = w.shape[-1]
    assert Ci == Co, (Ci, Co)
    G = _zgroup(Co)
    wz = _z_window(zt, Ci)
    yp = _round8(Y + 2)
    zhi = wz - zt - 1
    pad = ((0, 0), (1, 1), (1, yp - Y - 1), (Ci, zhi * Ci))
    xp = jnp.pad(xm, pad)
    dyp = jnp.pad(dym, pad)
    # dx = SAME conv of dy with spatially-flipped, io-transposed weights
    wt = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    wt_mat = _toeplitz_weights(wt, G, xm.dtype)
    kernel = _make_dxdw_kernel(xt, Y, yp, zt, wz, Ci, Co, G)
    dxm, wg = pl.pallas_call(
        kernel,
        grid=(B, X // xt, z // zt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, xt, Y, zt * Ci),
                         lambda b, i, k: (b, i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * (G + 2) * Ci, G * Co),
                         lambda b, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, X, Y, z * Ci), xm.dtype),
            jax.ShapeDtypeStruct((9 * (G + 2) * Ci, G * Co),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((xt + 2, yp, wz * Ci), xm.dtype),
            pltpu.VMEM((xt + 2, yp, wz * Ci), xm.dtype),
            pltpu.VMEM((xt, Y, 9 * (G + 2) * Ci), xm.dtype),
            pltpu.VMEM((xt, Y, 9 * (G + 2) * Ci), xm.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * X * Y * z * 27 * Ci * Co,
            bytes_accessed=(xm.size + dym.size) * xm.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, dyp, wt_mat)
    return dxm, _fold_toeplitz_grad(wg, G, Ci, Co)


def fused_bwd_eligible(x_shape, w_shape) -> Optional[Tuple[int, int]]:
    """Tile plan for the fused dx+dw kernel, or None. Needs Ci == Co on
    top of the forward kernel's constraints (shared tile geometry), plus
    VMEM for the doubled scratch (two halo tiles + two im2col buffers +
    the dw accumulator)."""
    if w_shape[3] != w_shape[4]:
        return None
    tiles = pallas_conv_tiles(x_shape, w_shape)
    if tiles is None:
        return None
    xt, zt = tiles
    B, X, Y, Z, Ci = x_shape
    # double the forward's data scratch; keep headroom for the f32
    # accumulator block
    if 2 * _vmem_bytes(xt, Y, zt, Ci, Ci) > 14 * 1024 * 1024:
        smaller = _choose_tiles(X, Z, Ci, Ci, Y,
                                budget=5 * 1024 * 1024)
        return smaller
    return tiles


def conv3x3x3_dxdw(x: jax.Array, dy: jax.Array, w: jax.Array,
                   tiles: Tuple[int, int], interpret: bool = False):
    """Unmerged-layout wrapper for the fused backward: merges (z, c)
    lanes around the kernel (2 input relayouts + 1 output relayout —
    what the per-op XLA conv-VJP layout copies cost is traded against)."""
    z = x.shape[3]
    dxm, dw = _conv3x3x3_dxdw_pallas(
        merge_zc(x), merge_zc(dy.astype(x.dtype)), w.astype(x.dtype),
        z, tiles[0], tiles[1], interpret)
    return unmerge_zc(dxm, z), dw.astype(w.dtype)


def merge_zc(x: jax.Array) -> jax.Array:
    """(B, X, Y, Z, C) -> (B, X, Y, Z*C). One relayout copy on TPU (the
    (8, 128) tiling moves from (Z, C) to (Y, Z*C)); chains pay it once at
    stage entry instead of inside every conv."""
    B, X, Y, Z, C = x.shape
    return x.reshape(B, X, Y, Z * C)


def unmerge_zc(xm: jax.Array, z: int) -> jax.Array:
    """(B, X, Y, Z*C) -> (B, X, Y, Z, C) (inverse relayout)."""
    B, X, Y, ZC = xm.shape
    return xm.reshape(B, X, Y, z, ZC // z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3x3_merged(xm: jax.Array, w: jax.Array, z: int,
                     tiles: Tuple[int, int],
                     interpret: bool = False) -> jax.Array:
    """Merged-layout 3^3 SAME conv: dx re-enters the merged kernel with
    flipped/transposed weights (stays merged end-to-end); dw uses the
    Pallas ``A^T @ dy`` kernel (``_conv3x3x3_dw_pallas``) — the
    activations are already in its merged layout, unlike the unmerged
    path where dw stays on XLA's conv VJP (see ``_conv_bwd``)."""
    return _conv3x3x3_pallas_merged(xm, w, z, tiles[0], tiles[1],
                                    interpret)


def _merged_fwd(xm, w, z, tiles, interpret):
    return conv3x3x3_merged(xm, w, z, tiles, interpret), (xm, w)


def _merged_bwd(z, tiles, interpret, res, dym):
    xm, w = res
    Ci = xm.shape[-1] // z
    Co = w.shape[-1]
    wt = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dym = dym.astype(xm.dtype)
    dx_tiles = pallas_conv_tiles(
        (xm.shape[0], xm.shape[1], xm.shape[2], z, Co),
        (3, 3, 3, Co, Ci))
    if dx_tiles is not None:
        dxm = _conv3x3x3_pallas_merged(dym, wt, z, dx_tiles[0],
                                       dx_tiles[1], interpret)
    else:
        dxm = merge_zc(_direct(unmerge_zc(dym, z), wt))
    dw = _conv3x3x3_dw_pallas(xm, dym, z, Ci, tiles[0], tiles[1],
                              interpret).astype(w.dtype)
    return dxm, dw


conv3x3x3_merged.defvjp(_merged_fwd, _merged_bwd)


def _fwd_impl(x, w, tiles, interpret):
    return _conv3x3x3_pallas(x, w, tiles[0], tiles[1], interpret)


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3x3_same(x: jax.Array, w: jax.Array,
                   tiles: Tuple[int, int],
                   interpret: bool = False) -> jax.Array:
    """3^3 stride-1 SAME conv via the Pallas kernel, with a custom VJP:
    dx re-enters the same kernel (flipped/transposed weights); dw uses
    XLA's conv VJP. ``tiles`` must come from ``pallas_conv_tiles``."""
    return _fwd_impl(x, w, tiles, interpret)


def _conv_fwd(x, w, tiles, interpret):
    return _fwd_impl(x, w, tiles, interpret), (x, w)


def _conv_bwd(tiles, interpret, res, dy):
    x, w = res
    # dx[b,i] = sum_k dy[b, i+1-k] w[k] -> SAME conv of dy with the
    # spatially flipped kernel, in/out channels swapped.
    wt = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dy = dy.astype(x.dtype)
    dx_tiles = pallas_conv_tiles(dy.shape, wt.shape)
    if dx_tiles is not None:
        dx = _fwd_impl(dy, wt, dx_tiles, interpret)
    else:
        dx = _direct(dy, wt)
    # dw via XLA's conv VJP, as documented above: substituting the Pallas
    # dw kernel here measured 35.9 -> 24.1 patches/s on the full LA step
    # (it fragments XLA's fused backward; see DESIGN.md "Negative
    # results"). The kernel is used only by the merged-chain path, where
    # activations are already in its layout.
    _, dw_vjp = jax.vjp(lambda wv: _direct(x, wv), w)
    dw, = dw_vjp(dy)
    return dx, dw


conv3x3x3_same.defvjp(_conv_fwd, _conv_bwd)


def reference_conv3x3x3(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Slow numpy oracle for tests."""
    B, X, Y, Z, Ci = x.shape
    Co = w.shape[-1]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((B, X, Y, Z, Co), np.float32)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                patch = xp[:, dx:dx + X, dy:dy + Y, dz:dz + Z, :]
                out += patch.astype(np.float32) @ w[dx, dy, dz].astype(
                    np.float32)
    return out
