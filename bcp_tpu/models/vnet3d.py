"""VNet3D — the 3D segmentation net for LA and Pancreas.

TPU-first re-design of the reference V-Net (`code/networks/VNet.py:145-290`
and the pancreas variant `code/pancreas/Vnet.py:92-194`, which share the
same topology and differ only in normalization):

encoder: 5 conv stages ([1,2,3,3,3] convs of 3^3) with stride-2 2^3-conv
downsampling 16->32->64->128->256; decoder: 2^3 transposed-conv upsampling
with *additive* skips and [3,3,2,1] conv stages; 1^3 output conv; channel
dropout p=0.5 on the bottleneck (x5) and the last decoder feature (x9) when
``has_dropout``. Optional residual conv blocks (`VNet.py:35-65`).

Deliberate divergences from the reference (documented):
- channels-last NDHWC layout (MXU-friendly; reference is NCDHW).
- the dead projection/prediction/contrastive-selector heads
  (`VNet.py:250-278`) are omitted — they are never trained or called by any
  entry point (SURVEY.md C24).
- ``__call__`` returns ``(logits, x8_up)``; the reference's second output
  (maxpooled x5, `VNet.py:289`) feeds only the dead contrastive path, while
  x8_up is what KDE_demo actually consumes (`KDE_demo.py:165`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcp_tpu.models.layers import (
    Norm,
    ZPackedConv3D,
    conv,
    conv_transpose,
    spatial_broadcast_dims,
)


def _stage_merged_z(x, features: int, normalization: str) -> int:
    """Z extent to run a conv stage in the merged (z, c) lane layout, or
    0 for the unmerged path.

    Merged chains keep activations in the (B, X, Y, Z*C) layout across
    every conv/norm/relu of the stage, entering the Pallas conv kernel
    without per-call relayouts. Opt-in via BCP_MERGED_CHAINS=1: isolated
    stage benchmarks win (L1 grad 48 -> 40 ms, L2 fwd 8.4 -> 6.2 on
    v5e), but inside the fused train step the opaque pallas_calls
    constrain XLA's layout assignment and the full step measured
    *slower* (35.9 -> 30.0 patches/s) — kept for kernel development and
    future XLA releases. Eligible when every conv of the stage is
    Ci == Co == features and the Pallas tile plan exists; norms must
    have a merged-layout path."""
    import os
    from bcp_tpu.ops import conv3d as _c3d
    if os.environ.get("BCP_MERGED_CHAINS", "0") != "1":
        return 0
    if jax.default_backend() != "tpu":   # Mosaic kernels are TPU-only
        return 0
    if x.ndim != 5 or x.shape[-1] != features:
        return 0
    if normalization not in ("batchnorm", "instancenorm", "none"):
        return 0
    tiles = _c3d.pallas_conv_tiles(x.shape,
                                   (3, 3, 3, features, features))
    return x.shape[3] if tiles is not None else 0


class ConvStage(nn.Module):
    """`ConvBlock` (`networks/VNet.py:6-32`): n x (3^3 conv -> norm -> relu)."""
    n_stages: int
    features: int
    normalization: str = "none"
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        from bcp_tpu.ops import conv3d as _c3d
        mz = _stage_merged_z(x, self.features, self.normalization)
        if mz:
            x = _c3d.merge_zc(x)
        for i in range(self.n_stages):
            # z-packed / merged-Pallas lowering for the MXU-starved
            # low-channel stages (identical params + math; see
            # layers.ZPackedConv3D)
            x = ZPackedConv3D(self.features, name=f"conv{i}",
                              dtype=self.dtype)(x, merged_z=mz)
            x = Norm(self.normalization, dtype=self.dtype,
                     groups=self.groups, name=f"norm{i}")(
                x, train, merged_z=mz)
            x = nn.relu(x)
        if mz:
            x = _c3d.unmerge_zc(x, mz)
        return x


class ResidualConvStage(nn.Module):
    """`ResidualConvBlock` (`networks/VNet.py:35-65`): relu after the last
    norm is deferred until after the residual add."""
    n_stages: int
    features: int
    normalization: str = "none"
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        from bcp_tpu.ops import conv3d as _c3d
        mz = _stage_merged_z(x, self.features, self.normalization)
        if mz:
            x = _c3d.merge_zc(x)
        residual = x
        for i in range(self.n_stages):
            x = ZPackedConv3D(self.features, name=f"conv{i}",
                              dtype=self.dtype)(x, merged_z=mz)
            x = Norm(self.normalization, dtype=self.dtype,
                     groups=self.groups, name=f"norm{i}")(
                x, train, merged_z=mz)
            if i != self.n_stages - 1:
                x = nn.relu(x)
        x = nn.relu(x + residual)
        if mz:
            x = _c3d.unmerge_zc(x, mz)
        return x


class DownBlock(nn.Module):
    """`DownsamplingConvBlock` (`VNet.py:68-92`): 2^3 conv stride 2."""
    features: int
    normalization: str = "none"
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, (2, 2, 2), strides=(2, 2, 2),
                 padding="VALID", name="conv", dtype=self.dtype)(x)
        x = Norm(self.normalization, dtype=self.dtype, groups=self.groups,
                 name="norm")(x, train)
        return nn.relu(x)


class UpBlock(nn.Module):
    """`UpsamplingDeconvBlock` (`VNet.py:95-119`): 2^3 deconv stride 2."""
    features: int
    normalization: str = "none"
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv_transpose(self.features, (2, 2, 2), (2, 2, 2),
                           name="deconv", dtype=self.dtype)(x)
        x = Norm(self.normalization, dtype=self.dtype, groups=self.groups,
                 name="norm")(x, train)
        return nn.relu(x)


class VNet3D(nn.Module):
    n_classes: int = 2
    n_filters: int = 16
    normalization: str = "batchnorm"   # LA: batchnorm (net_factory.py:9);
    # pancreas: instancenorm (pancreas/Vnet.py:93)
    has_dropout: bool = False
    has_residual: bool = False
    # compute dtype for mixed precision (params stay float32; logits are
    # cast back to float32 so losses/metrics are full precision)
    dtype: object = None
    # BN batch-grouping: G concatenated sub-batches normalised separately
    # (see layers.TorchBatchNorm); the self-train step uses G=2
    bn_groups: int = 1
    # rematerialise each stage's intra-block activations in the backward
    # (jax.checkpoint per stage): exact same math, ~1/3 the activation
    # HBM for the conv chains — lets bigger patches/batches fit one chip
    # at the cost of recomputing forwards during the backward. Composes
    # with spatial partitioning (Config.sp_devices) for the largest
    # volumes.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        nf, norm = self.n_filters, self.normalization
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stage = ResidualConvStage if self.has_residual else ConvStage
        DownBlock_, UpBlock_ = DownBlock, UpBlock
        if self.remat:
            # train (call arg 2 after self, x) is a static bool
            stage = nn.remat(stage, static_argnums=(2,))
            DownBlock_ = nn.remat(DownBlock, static_argnums=(2,))
            UpBlock_ = nn.remat(UpBlock, static_argnums=(2,))

        # ---- encoder (`VNet.py:167-186`)
        x1 = stage(1, nf, norm, self.dtype, self.bn_groups, name="block_one")(x, train)
        x1_dw = DownBlock_(2 * nf, norm, self.dtype, self.bn_groups, name="block_one_dw")(x1, train)
        x2 = stage(2, 2 * nf, norm, self.dtype, self.bn_groups, name="block_two")(x1_dw, train)
        x2_dw = DownBlock_(4 * nf, norm, self.dtype, self.bn_groups, name="block_two_dw")(x2, train)
        x3 = stage(3, 4 * nf, norm, self.dtype, self.bn_groups, name="block_three")(x2_dw, train)
        x3_dw = DownBlock_(8 * nf, norm, self.dtype, self.bn_groups, name="block_three_dw")(x3, train)
        x4 = stage(3, 8 * nf, norm, self.dtype, self.bn_groups, name="block_four")(x3_dw, train)
        x4_dw = DownBlock_(16 * nf, norm, self.dtype, self.bn_groups, name="block_four_dw")(x4, train)
        x5 = stage(3, 16 * nf, norm, self.dtype, self.bn_groups, name="block_five")(x4_dw, train)
        if self.has_dropout:
            x5 = nn.Dropout(0.5, broadcast_dims=spatial_broadcast_dims(
                x5.ndim), name="enc_dropout")(x5, deterministic=not train)

        # ---- decoder (`VNet.py:213-239`): additive skips
        x5_up = UpBlock_(8 * nf, norm, self.dtype, self.bn_groups, name="block_five_up")(x5, train) + x4
        x6 = stage(3, 8 * nf, norm, self.dtype, self.bn_groups, name="block_six")(x5_up, train)
        x6_up = UpBlock_(4 * nf, norm, self.dtype, self.bn_groups, name="block_six_up")(x6, train) + x3
        x7 = stage(3, 4 * nf, norm, self.dtype, self.bn_groups, name="block_seven")(x6_up, train)
        x7_up = UpBlock_(2 * nf, norm, self.dtype, self.bn_groups, name="block_seven_up")(x7, train) + x2
        x8 = stage(2, 2 * nf, norm, self.dtype, self.bn_groups, name="block_eight")(x7_up, train)
        x8_up = UpBlock_(nf, norm, self.dtype, self.bn_groups, name="block_eight_up")(x8, train) + x1
        x9 = stage(1, nf, norm, self.dtype, self.bn_groups, name="block_nine")(x8_up, train)
        if self.has_dropout:
            x9 = nn.Dropout(0.5, broadcast_dims=spatial_broadcast_dims(
                x9.ndim), name="dec_dropout")(x9, deterministic=not train)
        out_seg = conv(self.n_classes, (1, 1, 1), name="out_conv",
                       dtype=self.dtype)(x9)
        # promote: f32 logits for bf16/f32 compute, f64 stays f64 (the
        # train-fidelity gates run the whole net double precision)
        return out_seg.astype(jnp.promote_types(jnp.float32,
                                                out_seg.dtype)), x8_up
