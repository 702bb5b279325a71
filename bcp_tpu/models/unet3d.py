"""Residual 3D U-Net (reference C26, `networks/Unet3D.py:8-133`).

Unused by any reference entry point but part of its model zoo; provided as
a registered model family. Topology: 5 encoder levels
[64,256,256,512,1024] of double-conv blocks with optional 1x1-conv
residual adapters, 2^3 maxpool downsampling, 3^3 stride-2 transposed-conv
upsampling (torch output_padding=1 == flax 'SAME' transpose geometry),
*concat* skips, channel dropout p=0.5 on the two middle decoder levels,
1^3 output conv. ``UNet3D_DTC`` (`Unet3D.py:93-133`) adds a second output
head (dual-task variant); expose via ``n_heads=2``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcp_tpu.models.layers import (TorchBatchNorm, conv,
                                   spatial_broadcast_dims,
                                   torch_kernel_init)


class Conv3DBlock(nn.Module):
    """`Conv3D_Block` (`Unet3D.py:183-212`): 2x (3^3 conv -> BN -> ReLU)
    with optional 1x1-conv residual."""
    features: int
    residual: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = conv(self.features, (3, 3, 3), name="conv1",
                 dtype=self.dtype)(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn1")(y, not train)
        y = nn.relu(y)
        y = conv(self.features, (3, 3, 3), name="conv2",
                 dtype=self.dtype)(y)
        y = TorchBatchNorm(dtype=self.dtype, name="bn2")(y, not train)
        y = nn.relu(y)
        if self.residual:
            res = nn.Conv(self.features, (1, 1, 1), use_bias=False,
                          kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="residual")(x)
            y = y + res
        return y


class Deconv3DBlock(nn.Module):
    """`Deconv3D_Block` (`Unet3D.py:215-227`): 3^3 stride-2 deconv + ReLU."""
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.features, (3, 3, 3), strides=(2, 2, 2),
                             padding="SAME", dtype=self.dtype,
                             kernel_init=torch_kernel_init,
                             name="deconv")(x)
        return nn.relu(y)


class UNet3D(nn.Module):
    n_classes: int = 2
    feat_channels: Sequence[int] = (64, 256, 256, 512, 1024)
    residual: bool = True
    n_heads: int = 1          # 2 == UNet_DTC (`Unet3D.py:93-133`)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        fc = self.feat_channels
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def pool(v):
            return nn.max_pool(v, (2, 2, 2), (2, 2, 2))

        x1 = Conv3DBlock(fc[0], self.residual, self.dtype,
                         name="conv_blk1")(x, train)
        x2 = Conv3DBlock(fc[1], self.residual, self.dtype,
                         name="conv_blk2")(pool(x1), train)
        x3 = Conv3DBlock(fc[2], self.residual, self.dtype,
                         name="conv_blk3")(pool(x2), train)
        x4 = Conv3DBlock(fc[3], self.residual, self.dtype,
                         name="conv_blk4")(pool(x3), train)
        base = Conv3DBlock(fc[4], self.residual, self.dtype,
                           name="conv_blk5")(pool(x4), train)

        d4 = jnp.concatenate(
            [Deconv3DBlock(fc[3], self.dtype, name="deconv_blk4")(base),
             x4], axis=-1)
        d4 = Conv3DBlock(fc[3], self.residual, self.dtype,
                         name="dec_conv_blk4")(d4, train)
        d3 = jnp.concatenate(
            [Deconv3DBlock(fc[2], self.dtype, name="deconv_blk3")(d4),
             x3], axis=-1)
        d3 = Conv3DBlock(fc[2], self.residual, self.dtype,
                         name="dec_conv_blk3")(d3, train)
        d3 = nn.Dropout(0.5, broadcast_dims=spatial_broadcast_dims(d3.ndim),
                        name="drop3")(d3, deterministic=not train)
        d2 = jnp.concatenate(
            [Deconv3DBlock(fc[1], self.dtype, name="deconv_blk2")(d3),
             x2], axis=-1)
        d2 = Conv3DBlock(fc[1], self.residual, self.dtype,
                         name="dec_conv_blk2")(d2, train)
        d2 = nn.Dropout(0.5, broadcast_dims=spatial_broadcast_dims(d2.ndim),
                        name="drop2")(d2, deterministic=not train)
        d1 = jnp.concatenate(
            [Deconv3DBlock(fc[0], self.dtype, name="deconv_blk1")(d2),
             x1], axis=-1)
        d1 = Conv3DBlock(fc[0], self.residual, self.dtype,
                         name="dec_conv_blk1")(d1, train)

        heads = []
        for h in range(self.n_heads):
            heads.append(conv(self.n_classes, (1, 1, 1),
                              name=f"one_conv_{h}",
                              dtype=self.dtype)(d1).astype(jnp.float32))
        if self.n_heads == 1:
            return heads[0], d1
        # dual-task variant returns (out_tanh, out_seg) FLAT, matching
        # `UNet_DTC.forward` (`Unet3D.py:171-178`): tanh level-set head
        # first — `test_DTC_single_case` consumes out[0]
        # (`pancreas/test_util.py:73`)
        return jnp.tanh(heads[0]), heads[1]
