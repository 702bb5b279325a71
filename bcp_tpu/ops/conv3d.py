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

    kernel = _make_kernel(xt, Y, yp, zt, wz, Ci, Co, G)
    flops = 2 * B * X * Y * Z * 27 * Ci * Co
    out = pl.pallas_call(
        kernel,
        grid=(B, X // xt, Z // zt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, xt, Y, zt * Co),
            lambda b, i, k: (b, i, 0, k),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z * Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((xt + 2, yp, wz * Ci), x.dtype),
            pltpu.VMEM((xt, Y, 9 * (G + 2) * Ci), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, wmat)
    return out.reshape(B, X, Y, Z, Co)


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
