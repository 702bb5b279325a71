"""Shared building blocks: torch-compatible initialisers, norms, resizing.

Channels-last everywhere — (N, *spatial, C) — so convs lower straight onto
the MXU without layout transposes (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import math
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# --- torch-compatible initialisation -------------------------------------
#
# torch Conv layers default to kaiming_uniform(a=sqrt(5)) weights, i.e.
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and the same-bound uniform bias. We
# reproduce that so training dynamics (loss curves for the first epochs)
# match the reference rather than flax's lecun_normal default.

# variance of U(-b, b) is b^2/3; with b = 1/sqrt(fan_in) that's 1/(3*fan_in).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float_):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv(features: int, kernel: Sequence[int], strides=None,
         padding="SAME", name=None, dtype=None) -> nn.Conv:
    return nn.Conv(features, kernel_size=tuple(kernel),
                   strides=strides, padding=padding, dtype=dtype,
                   kernel_init=torch_kernel_init, name=name)


_CONV3D_DN = ("NDHWC", "DHWIO", "NDHWC")

# single definition of the direct 3^3 SAME lowering lives in ops/conv3d
from bcp_tpu.ops.conv3d import _direct as _direct_conv3d  # noqa: E402


def _pack_weight(w: jax.Array, z_tile: int) -> jax.Array:
    """(3,3,kz,Ci,Co) -> block-Toeplitz (3,3,z_tile+kz-1,Ci,z_tile*Co)."""
    kz, ci, co = w.shape[2], w.shape[3], w.shape[4]
    out = jnp.zeros((w.shape[0], w.shape[1], z_tile + kz - 1, ci,
                     z_tile, co), w.dtype)
    for zo in range(z_tile):
        out = out.at[:, :, zo:zo + kz, :, zo, :].add(w)
    return out.reshape(w.shape[0], w.shape[1], z_tile + kz - 1, ci,
                       z_tile * co)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _zpacked_conv3d(x: jax.Array, w: jax.Array, z_tile: int) -> jax.Array:
    """Forward lowered as the z-tiled block-Toeplitz conv; backward is
    hand-split (term-identical math — the packed kernel's extra entries
    are structural zeros): dx re-enters this same packed lowering on the
    cotangent with spatially-flipped, in/out-transposed weights (a 3^3
    SAME correlation is self-adjoint up to flips; measured 18.5 -> 12 ms
    at the 16-feature full-res shape on v5e vs the direct conv the VJP
    would pick), dw keeps the direct conv's VJP (a weight-sized
    reduction). Differentiating *through* the stride-``z_tile`` conv +
    pack scatter instead blew up the XLA-TPU compile of the fused train
    step (>16 min vs ~3)."""
    wp = _pack_weight(w, z_tile)
    y = jax.lax.conv_general_dilated(
        x, wp, (1, 1, z_tile), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=_CONV3D_DN)
    b, xx, yy, zt, _ = y.shape
    return y.reshape(b, xx, yy, zt * z_tile, w.shape[-1])


def _zpacked_fwd(x, w, z_tile):
    return _zpacked_conv3d(x, w, z_tile), (x, w)




def _dw_via_packed(x: jax.Array, dy: jax.Array, z_tile: int,
                   w_shape: Sequence[int]) -> jax.Array:
    """Weight grad computed in the packed domain (opt-in BCP_DW_PACKED=1).

    Transpose the z-packed forward w.r.t. its *packed* weight — the dw
    contraction's output-feature dim is then ``z_tile*Cout = 128``, so it
    fills the MXU lanes the direct conv VJP leaves padded — and fold the
    block-Toeplitz placements back onto the (3,3,kz,Ci,Co) kernel
    (transpose of ``_pack_weight``'s scatter). Term-identical to the
    direct conv VJP up to float reassociation; costs one lane repack of
    ``dy`` (16 -> 128 lanes) plus ``z_tile`` kernel-sized slice adds.
    """
    kz, ci, co = w_shape[2], w_shape[3], w_shape[4]
    b, X, Y, Z, _ = dy.shape
    zt = z_tile
    dyp = dy.reshape(b, X, Y, Z // zt, zt * co)
    wp_spec = jax.ShapeDtypeStruct(
        (w_shape[0], w_shape[1], zt + kz - 1, ci, zt * co), x.dtype)

    def conv_wp(wp):
        return jax.lax.conv_general_dilated(
            x, wp, (1, 1, zt), [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=_CONV3D_DN)

    dwp, = jax.linear_transpose(conv_wp, wp_spec)(dyp)
    dwp = dwp.reshape(w_shape[0], w_shape[1], zt + kz - 1, ci, zt, co)
    dw = dwp[:, :, 0:kz, :, 0, :]
    for zo in range(1, zt):
        dw = dw + dwp[:, :, zo:zo + kz, :, zo, :]
    return dw


def _zpacked_bwd(z_tile, res, dy):
    # dw stays on XLA's conv VJP deliberately: swapping in the Pallas
    # A^T @ dy kernel (ops/conv3d._conv3x3x3_dw_pallas) measured 35.9 ->
    # 24.1 patches/s for the full LA step on v5e — in-graph, XLA folds
    # the dw reduction into its fusion/scheduling, and an opaque
    # pallas_call there fragments the backward and forces extra layout
    # copies. The kernel remains available for merged-chain development
    # (BCP_MERGED_CHAINS=1).
    x, w = res
    dy = dy.astype(x.dtype)
    if (os.environ.get("BCP_FUSED_BWD", "0") == "1"
            and jax.default_backend() == "tpu"):
        # round-4 experiment (verdict #3): ONE Pallas call computing the
        # dx+dw pair — the standalone dw kernel fragmented XLA's
        # backward schedule at its boundary; fusing dx into the same
        # call removes that boundary. Ci == Co stages only.
        from bcp_tpu.ops import conv3d as _c3d
        tiles = _c3d.fused_bwd_eligible(x.shape, w.shape)
        if tiles is not None:
            return _c3d.conv3x3x3_dxdw(x, dy, w, tiles)
    wt = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _zpacked_conv3d(dy, wt, z_tile)
    # (A third dw substitution — tap-wise dot_generals contracting the
    # flattened (B,X,Y,Z) dim in the activations' native layout — also
    # lost in-graph: 36.0 -> 30.5 patches/s on the full LA step, r3.
    # See DESIGN.md "Negative results".)
    if os.environ.get("BCP_DW_PACKED", "0") == "1":
        dw = _dw_via_packed(x, dy, z_tile, w.shape)
    else:
        _, dw_vjp = jax.vjp(lambda wv: _direct_conv3d(x, wv), w)
        dw, = dw_vjp(dy)
    return dx, dw


_zpacked_conv3d.defvjp(_zpacked_fwd, _zpacked_bwd)


class ZPackedConv3D(nn.Module):
    """3^3 stride-1 SAME conv with MXU-aware lowerings.

    Low-channel 3D convs starve the MXU: a 16-feature conv leaves 112 of
    the 128 output lanes padded (measured 4% MFU at the V-Net level-1
    shape on v5e). Three lowerings, best-first:

    1. **Pallas kernel** (`ops/conv3d.py`, TPU backends only): in-VMEM
       im2col with the z block-Toeplitz weight expansion — all 128 MXU
       output lanes productive, no HBM im2col. Measured ~4x over the
       direct lowering at the V-Net level-1 shape on v5e.
    2. **z-packed XLA conv** (``_zpacked_conv3d``): kernel
       ``(3, 3, z_tile+2, Cin, z_tile*Cout)`` with the weights scattered
       block-Toeplitz along (z_window, z_out), z stride ``z_tile`` —
       fills the output lanes at the price of structurally-zero K
       entries; measured 18.6 -> 12.0 ms forward for the level-1 conv at
       LA shapes (batch 8).
    3. **direct XLA conv** for everything else (>=64 features measured a
       wash vs z-packing on v5e).

    All three are term-identical up to bf16 reassociation, and parameters
    are stored in the standard ``nn.Conv`` layout — kernel
    ``(3,3,3,Cin,Cout)``, bias ``(Cout,)`` — so checkpoints are
    interchangeable across lowerings and devices.
    """
    features: int
    dtype: object = None
    # Pallas lowering is opt-in per model: profitable only when the
    # surrounding ops keep the merged (z, c) lane layout (see
    # ops/conv3d.py) — standalone, the XLA relayout at the call boundary
    # (~1.4 ms at LA level-1 shapes) outweighs the kernel's win.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, merged_z: int = 0):
        from bcp_tpu.ops import conv3d as _c3d
        if merged_z:
            # merged-layout chain entry: x is (B, X, Y, Z*Ci) with the
            # (z, ci) dims in the lane axis (see ops/conv3d.py); params
            # are identical to the unmerged path, so checkpoints are
            # interchangeable.
            ci = x.shape[-1] // merged_z
        else:
            ci = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        w = kernel.astype(dtype)
        if merged_z:
            tiles = _c3d.pallas_conv_tiles(
                (x.shape[0], x.shape[1], x.shape[2], merged_z, ci),
                (3, 3, 3, ci, self.features))
            if tiles is not None:
                ym = _c3d.conv3x3x3_merged(x, w, merged_z, tiles)
            else:   # correctness fallback: unmerge, conv, re-merge
                y5 = _direct_conv3d(_c3d.unmerge_zc(x, merged_z), w)
                ym = _c3d.merge_zc(y5)
            return ym + jnp.tile(bias.astype(dtype), merged_z)
        z = x.shape[3]
        tiles = None
        if self.use_pallas and jax.default_backend() == "tpu":
            tiles = _c3d.pallas_conv_tiles(
                x.shape, (3, 3, 3, ci, self.features))
        pad_lanes = int(os.environ.get("BCP_PAD_LANES", "0"))
        if tiles is not None:
            y = _c3d.conv3x3x3_same(x, w, tiles)
        elif pad_lanes and self.features < pad_lanes:
            # Experiment (opt-in): fill output lanes by zero-padding Cout
            # instead of z-packing — no boundary repack copies, at the
            # price of structurally-zero output lanes (2x at pad 32).
            # Plain autodiff: dw's pad->slice transpose keeps grads exact.
            wpad = jnp.pad(
                w, ((0, 0),) * 4 + ((0, pad_lanes - self.features),))
            y = _direct_conv3d(x, wpad)[..., :self.features]
        else:
            # lanes fill at z_tile*Cout = 128; larger tiles pay more
            # padded K
            z_tile = 128 // self.features if self.features <= 32 else 1
            while z_tile > 1 and z % z_tile != 0:
                z_tile //= 2
            if z_tile <= 1 or z < z_tile + 2:
                y = _direct_conv3d(x, w)
            else:
                y = _zpacked_conv3d(x, w, z_tile)
        return y + bias.astype(dtype)


def conv_transpose(features: int, kernel: Sequence[int], strides,
                   name=None, dtype=None) -> nn.ConvTranspose:
    return nn.ConvTranspose(features, kernel_size=tuple(kernel),
                            strides=tuple(strides), padding="VALID",
                            dtype=dtype,
                            kernel_init=torch_kernel_init, name=name)


# --- norms ----------------------------------------------------------------

class TorchBatchNorm(nn.Module):
    """BatchNorm with torch semantics + optional *batch grouping*.

    ``groups=G`` treats the leading batch axis as G concatenated
    sub-batches and normalises each with its own statistics — numerically
    identical to G separate forwards (what the reference does for its two
    mixed inputs, `LA_BCP_train.py:252-253`) while letting the convs run
    as one fused batch on the MXU. Running stats are folded sequentially
    (torch updates them forward-by-forward: ra <- m*ra + (1-m)*stat_i).

    A grad through a G=2-grouped concat forward fits HBM where a vmapped
    pair of forwards does not (vmap materialises less favourable
    layouts); measured ~15% faster per train step on v5e.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    groups: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, use_running_average: bool, merged_z: int = 0):
        zrep = max(merged_z, 1)
        C = x.shape[-1] // zrep
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (C,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (C,))
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)

        def lanes(v):
            # per-channel vector -> per-lane vector (tiled over z when
            # the (z, c) dims are lane-merged)
            return jnp.tile(v, zrep) if merged_z else v

        if use_running_average:
            mean = ra_mean.value.astype(dtype)
            var = ra_var.value.astype(dtype)
            inv = jax.lax.rsqrt(var + jnp.asarray(self.epsilon, dtype))
            return x * lanes(inv * scale.astype(dtype)) + \
                lanes(bias.astype(dtype) - mean * inv * scale.astype(dtype))

        G = self.groups
        n = x.shape[0]
        assert n % G == 0, (n, G)
        xg = x.reshape(G, n // G, *x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))
        # Stats in f32 (the casts fuse into the reductions — no f32 copy
        # of the activations is materialised, which matters for HBM at
        # the full LA shapes); normalisation runs in the compute dtype.
        # In merged layout the reduction runs in two stages: over
        # (batch, x, y) keeping the (z, c) lanes, then over z on the
        # tiny (G, Z, C) result — same equal-weight mean, no relayout.
        # promote_types keeps f64 intact when the net runs double
        # precision (the train-fidelity gates); bf16/f32 still get f32
        sdt = jnp.promote_types(jnp.float32, xg.dtype)
        xf32 = xg.astype(sdt)
        mean_g = jnp.mean(xf32, axis=red)                # (G, [Z*]C)
        mean2_g = jnp.mean(jnp.square(xf32), axis=red)
        if merged_z:
            mean_g = jnp.mean(mean_g.reshape(G, zrep, C), axis=1)
            mean2_g = jnp.mean(mean2_g.reshape(G, zrep, C), axis=1)
        var_g = jnp.maximum(mean2_g - jnp.square(mean_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)            # (G, C)
        mul = (inv_g * scale[None].astype(sdt)).astype(dtype)
        add = (bias[None].astype(sdt)
               - mean_g * inv_g * scale[None].astype(sdt)).astype(dtype)
        if merged_z:
            mul = jnp.tile(mul, (1, zrep))
            add = jnp.tile(add, (1, zrep))
        shape_g = (G, 1) + (1,) * (xg.ndim - 3) + (xg.shape[-1],)
        y = xg * mul.reshape(shape_g) + add.reshape(shape_g)
        y = y.reshape(x.shape)

        if not self.is_initializing():
            m = self.momentum
            # torch folds the UNBIASED batch variance into running_var
            # (Bessel N/(N-1)) while normalising with the biased one
            count = 1
            for a in red:
                count *= xg.shape[a]
            count *= zrep
            var_u = var_g * (count / max(count - 1, 1))
            new_mean, new_var = ra_mean.value, ra_var.value
            for g in range(G):
                new_mean = m * new_mean + (1 - m) * mean_g[g]
                new_var = m * new_var + (1 - m) * var_u[g]
            ra_mean.value = new_mean
            ra_var.value = new_var
        return y


def instance_norm(x: jax.Array, eps: float = 1e-5,
                  merged_z: int = 0) -> jax.Array:
    """Parameter-free instance norm over spatial dims (torch
    ``InstanceNorm3d`` defaults: affine=False, no running stats —
    `pancreas/Vnet.py:25`). With ``merged_z`` the input is
    (B, X, Y, Z*C) and stats fold the z part of the lane axis in a
    second, tiny reduction stage."""
    if merged_z:
        B = x.shape[0]
        C = x.shape[-1] // merged_z
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=(1, 2))                      # (B, Z*C)
        m2 = jnp.square(xf).mean(axis=(1, 2))
        mean = m1.reshape(B, merged_z, C).mean(axis=1)     # (B, C)
        mean2 = m2.reshape(B, merged_z, C).mean(axis=1)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        mul = jnp.tile(jax.lax.rsqrt(var + eps), (1, merged_z))
        add = -jnp.tile(mean, (1, merged_z)) * mul
        return (x * mul[:, None, None, :].astype(x.dtype)
                + add[:, None, None, :].astype(x.dtype))
    axes = tuple(range(1, x.ndim - 1))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class Norm(nn.Module):
    """Dispatch on the reference's normalization strings
    (`networks/VNet.py:18-25`). ``dtype`` is the compute dtype (bf16 for
    mixed precision); params stay float32."""
    kind: str  # 'batchnorm' | 'groupnorm' | 'instancenorm' | 'none'
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool, merged_z: int = 0):
        if self.kind == "batchnorm":
            return TorchBatchNorm(momentum=0.9, epsilon=1e-5,
                                  groups=self.groups,
                                  dtype=self.dtype)(x, not train,
                                                    merged_z=merged_z)
        if self.kind == "instancenorm":
            return instance_norm(x, merged_z=merged_z).astype(
                self.dtype if self.dtype is not None else x.dtype)
        if self.kind == "none":
            return x
        if merged_z:
            raise ValueError(
                f"normalization {self.kind!r} has no merged-layout path")
        if self.kind == "groupnorm":
            return nn.GroupNorm(num_groups=16, epsilon=1e-5,
                                dtype=self.dtype)(x)
        raise ValueError(f"unknown normalization {self.kind!r}")


# --- dropout --------------------------------------------------------------
#
# torch ``Dropout3d``/``Dropout2d`` zero whole feature maps per
# (sample, channel) pair (`networks/VNet.py:165,211`); in flax that is
# ``nn.Dropout(rate, broadcast_dims=spatial_dims)``. Models construct these
# inline (must be inside a compact module context).

def spatial_broadcast_dims(ndim: int):
    """broadcast_dims for channel dropout on an (N, *spatial, C) tensor."""
    return tuple(range(1, ndim - 1))


# --- resizing -------------------------------------------------------------

def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample with torch's ``align_corners=True`` grid
    (`networks/unet.py:50`): output coord o samples input at
    o * (in-1) / (out-1)."""
    spatial = x.shape[1:-1]
    out_spatial = tuple(2 * s for s in spatial)
    out_shape = (x.shape[0],) + out_spatial + (x.shape[-1],)
    scale = jnp.array([(2 * s - 1) / (s - 1) if s > 1 else 1.0
                       for s in spatial], dtype=x.dtype)
    translation = 0.5 * (1.0 - scale)
    dims = tuple(range(1, x.ndim - 1))
    return jax.image.scale_and_translate(
        x, out_shape, dims, scale, translation,
        method="linear", antialias=False)
