"""UNet2D — the 2D segmentation net for ACDC.

Re-design of the reference U-Net (`code/networks/unet.py:15-257`, itself
from PyMIC): encoder = 5 ConvBlocks (conv-BN-LeakyReLU-dropout-conv-BN-
LeakyReLU) with 2x2 maxpool downsampling, channels [16,32,64,128,256] and
per-level dropout [0.05,0.1,0.2,0.3,0.5]; decoder = 1x1-conv channel
reduction + bilinear(align_corners=True) 2x upsample + *concat* skips +
ConvBlock (dropout 0); 3x3 output conv.

Divergences (documented): channels-last NHWC layout; the dead projection /
prediction / selector heads (`unet.py:162-190`) live in ``unet_extras``
(SepUNet2D / UNetTsne carry them; the live ACDC net doesn't need them).
``__call__`` returns ``(logits, x_last)`` — `UNet` semantics
(`unet.py:104-116`); ACDC's `UNet_2d` simply drops the second output.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
from flax import linen as nn

from bcp_tpu.models.layers import conv, upsample2x_align_corners


class ConvBlock(nn.Module):
    """`ConvBlock` (`networks/unet.py:15-30`). Element-wise dropout sits
    between the two conv-BN-LeakyReLU pairs."""
    features: int
    dropout_p: float
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        from bcp_tpu.models.layers import TorchBatchNorm
        x = conv(self.features, (3, 3), name="conv0", dtype=self.dtype)(x)
        x = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                           groups=self.groups, name="bn0")(x, not train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Dropout(self.dropout_p, name="dropout")(
            x, deterministic=not train)
        x = conv(self.features, (3, 3), name="conv1", dtype=self.dtype)(x)
        x = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                           groups=self.groups, name="bn1")(x, not train)
        return nn.leaky_relu(x, negative_slope=0.01)


class UpBlock(nn.Module):
    """`UpBlock` (`networks/unet.py:45-57`): 1x1 conv -> bilinear 2x
    (align_corners=True) -> concat skip -> ConvBlock."""
    skip_features: int
    out_features: int
    dtype: object = None
    groups: int = 1

    @nn.compact
    def __call__(self, x_deep, x_skip, train: bool):
        x = conv(self.skip_features, (1, 1), name="conv1x1",
                 dtype=self.dtype)(x_deep)
        x = upsample2x_align_corners(x)
        x = jax.numpy.concatenate([x_skip.astype(x.dtype), x], axis=-1)
        return ConvBlock(self.out_features, 0.0, dtype=self.dtype,
                         groups=self.groups, name="conv")(x, train)


class UNet2D(nn.Module):
    n_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: object = None
    bn_groups: int = 1
    # also return the encoder bottleneck (feature[4]) — Sep_UNet_2d's
    # forward pools it for its discriminator feature (`unet.py:313-316`)
    expose_bottleneck: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        ft, dp = self.feature_chns, self.dropout
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # ---- encoder (`unet.py:80-86`)
        x0 = ConvBlock(ft[0], dp[0], dtype=self.dtype, groups=self.bn_groups, name="in_conv")(x, train)
        x1 = ConvBlock(ft[1], dp[1], dtype=self.dtype, groups=self.bn_groups, name="down1")(
            nn.max_pool(x0, (2, 2), (2, 2)), train)
        x2 = ConvBlock(ft[2], dp[2], dtype=self.dtype, groups=self.bn_groups, name="down2")(
            nn.max_pool(x1, (2, 2), (2, 2)), train)
        x3 = ConvBlock(ft[3], dp[3], dtype=self.dtype, groups=self.bn_groups, name="down3")(
            nn.max_pool(x2, (2, 2), (2, 2)), train)
        x4 = ConvBlock(ft[4], dp[4], dtype=self.dtype, groups=self.bn_groups, name="down4")(
            nn.max_pool(x3, (2, 2), (2, 2)), train)

        # ---- decoder (`unet.py:104-116`): concat skips
        y = UpBlock(ft[3], ft[3], dtype=self.dtype, groups=self.bn_groups, name="up1")(x4, x3, train)
        y = UpBlock(ft[2], ft[2], dtype=self.dtype, groups=self.bn_groups, name="up2")(y, x2, train)
        y = UpBlock(ft[1], ft[1], dtype=self.dtype, groups=self.bn_groups, name="up3")(y, x1, train)
        x_last = UpBlock(ft[0], ft[0], dtype=self.dtype, groups=self.bn_groups, name="up4")(y, x0, train)
        logits = conv(self.n_classes, (3, 3), name="out_conv",
                      dtype=self.dtype)(x_last)
        out_dt = jax.numpy.promote_types(jax.numpy.float32, logits.dtype)
        if self.expose_bottleneck:
            return logits.astype(out_dt), x_last, x4
        return logits.astype(out_dt), x_last
