"""Shared building blocks: torch-compatible initialisers, norms, resizing.

Channels-last everywhere — (N, *spatial, C) — so convs lower straight onto
the MXU without layout transposes (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
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
         padding="SAME", name=None) -> nn.Conv:
    return nn.Conv(features, kernel_size=tuple(kernel),
                   strides=strides, padding=padding,
                   kernel_init=torch_kernel_init, name=name)


def conv_transpose(features: int, kernel: Sequence[int], strides,
                   name=None) -> nn.ConvTranspose:
    return nn.ConvTranspose(features, kernel_size=tuple(kernel),
                            strides=tuple(strides), padding="VALID",
                            kernel_init=torch_kernel_init, name=name)


# --- norms ----------------------------------------------------------------

def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free instance norm over spatial dims (torch
    ``InstanceNorm3d`` defaults: affine=False, no running stats —
    `pancreas/Vnet.py:25`)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class Norm(nn.Module):
    """Dispatch on the reference's normalization strings
    (`networks/VNet.py:18-25`)."""
    kind: str  # 'batchnorm' | 'groupnorm' | 'instancenorm' | 'none'

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind == "batchnorm":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5)(x)
        if self.kind == "groupnorm":
            return nn.GroupNorm(num_groups=16, epsilon=1e-5)(x)
        if self.kind == "instancenorm":
            return instance_norm(x)
        if self.kind == "none":
            return x
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
