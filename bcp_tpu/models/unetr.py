"""UNETR — ViT-encoder U-Net (reference C26, `networks/unetr.py:54-296`).

Unused by any reference entry point but part of its model zoo. TPU-first
implementation: the attention core is batched einsum matmuls in bf16 on
the MXU; tokens stay in a (N, T, D) layout.

Architecture (`unetr.py:194-296`): 16^3 patch embedding (stride-16 conv)
+ learned position embeddings; 12 pre-LN transformer blocks (MHA with
per-head dim D/H, attn+proj dropout; ReLU MLP d_ff=2048 with dropout);
hidden states extracted at layers 3/6/9/12 are reshaped back to the patch
grid and decoded by a conv/deconv U-Net with concat skips down to a 1^3
output conv.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcp_tpu.models.layers import TorchBatchNorm, conv, torch_kernel_init


class SelfAttention(nn.Module):
    """`SelfAttention` (`unetr.py:54-99`)."""
    num_heads: int
    embed_dim: int
    dropout: float
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        D, H = self.embed_dim, self.num_heads
        hd = D // H
        q = nn.Dense(D, dtype=self.dtype, name="query")(x)
        k = nn.Dense(D, dtype=self.dtype, name="key")(x)
        v = nn.Dense(D, dtype=self.dtype, name="value")(x)

        def heads(t):  # (N, T, D) -> (N, H, T, hd)
            return t.reshape(*t.shape[:-1], H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, name="attn_dropout")(
            probs, deterministic=not train)
        ctx = jnp.einsum("nhqk,nhkd->nhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(*x.shape[:-1], D)
        out = nn.Dense(D, dtype=self.dtype, name="out")(
            ctx.astype(x.dtype))
        return nn.Dropout(self.dropout, name="proj_dropout")(
            out, deterministic=not train)


class TransformerBlock(nn.Module):
    """`TransformerBlock` (`unetr.py:148-170`): pre-LN attention + pre-LN
    ReLU-MLP (`PositionwiseFeedForward`, d_ff=2048), residual adds."""
    embed_dim: int
    num_heads: int
    dropout: float
    d_ff: int = 2048
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="attention_norm")(x)
        y = SelfAttention(self.num_heads, self.embed_dim, self.dropout,
                          self.dtype, name="attn")(y, train)
        x = y + h
        h = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="mlp_norm")(x)
        y = nn.Dense(self.d_ff, dtype=self.dtype, name="w_1")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.1, name="mlp_dropout")(y, deterministic=not train)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="w_2")(y)
        return y + h


class ConvBNReLU(nn.Module):
    """`Conv3DBlock` (`unetr.py:27-37`)."""
    features: int
    kernel: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, (self.kernel,) * 3, dtype=self.dtype,
                 name="conv")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn")(x, not train)
        return nn.relu(x)


class DeconvBlock(nn.Module):
    """`Deconv3DBlock` (`unetr.py:40-51`): 2^3 deconv -> 3^3 conv -> BN
    -> ReLU."""
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", dtype=self.dtype,
                             kernel_init=torch_kernel_init,
                             name="deconv")(x)
        x = conv(self.features, (3, 3, 3), dtype=self.dtype,
                 name="conv")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn")(x, not train)
        return nn.relu(x)


def _deconv2x(features, dtype, name):
    return nn.ConvTranspose(features, (2, 2, 2), strides=(2, 2, 2),
                            padding="VALID", dtype=dtype,
                            kernel_init=torch_kernel_init, name=name)


class UNETR(nn.Module):
    img_shape: Sequence[int] = (128, 128, 128)
    n_classes: int = 2
    embed_dim: int = 768
    patch_size: int = 16
    num_heads: int = 12
    num_layers: int = 12
    dropout: float = 0.1
    ext_layers: Sequence[int] = (3, 6, 9, 12)
    # `UNETR_DTC` (`unetr.py:296-407`): adds a tanh dual-task head — the
    # shared decoder feature feeds two parallel 1^3-conv headers,
    # returning (tanh(header0), header00) like the DTC level-set variant.
    dtc: bool = False
    # transformer MLP width (`PositionwiseFeedForward` d_ff=2048,
    # `unetr.py:104`); reduced in tests for compile time
    d_ff: int = 2048
    # uniform scale on the decoder's channel widths; 1.0 reproduces the
    # reference's hardcoded 512/256/128/64 plan (`unetr.py:222-296`),
    # smaller values exist for cheap CI fixtures
    width_scale: float = 1.0
    dtype: object = None

    def _w(self, f: int) -> int:
        return max(4, round(f * self.width_scale))

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        P, D = self.patch_size, self.embed_dim
        patch_dim = tuple(s // P for s in self.img_shape)
        # static python arithmetic: jnp here would make n_patches a tracer
        # under jit and break param-shape construction
        n_patches = math.prod(patch_dim)
        raw = x
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # ---- patch embedding (`unetr.py:128-146`)
        tokens = nn.Conv(D, (P, P, P), strides=(P, P, P), padding="VALID",
                         kernel_init=torch_kernel_init, dtype=self.dtype,
                         name="patch_embeddings")(x)
        tokens = tokens.reshape(tokens.shape[0], -1, D)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, n_patches, D))
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.dropout, name="embed_dropout")(
            tokens, deterministic=not train)

        # ---- transformer stack with multi-depth extraction
        extracted = []
        h = tokens
        for i in range(self.num_layers):
            h = TransformerBlock(D, self.num_heads, self.dropout,
                                 d_ff=self.d_ff, dtype=self.dtype,
                                 name=f"layer{i}")(h, train)
            if (i + 1) in self.ext_layers:
                extracted.append(h)
        z3, z6, z9, z12 = [
            z.reshape(z.shape[0], *patch_dim, D) for z in extracted]

        dt = self.dtype

        # ---- U-Net decoder (`unetr.py:222-296`); channel plan scaled
        # by width_scale (1.0 = the reference's hardcoded widths)
        w = self._w
        z12 = _deconv2x(w(512), dt, "decoder12_upsampler")(z12)
        z9 = DeconvBlock(w(512), dt, name="decoder9")(z9, train)
        y = jnp.concatenate([z9, z12], axis=-1)
        for j, f in enumerate((512, 512, 512)):
            y = ConvBNReLU(w(f), 3, dt, name=f"dec9_conv{j}")(y, train)
        z9 = _deconv2x(w(256), dt, "decoder9_upsampler")(y)

        z6 = DeconvBlock(w(512), dt, name="decoder6_a")(z6, train)
        z6 = DeconvBlock(w(256), dt, name="decoder6_b")(z6, train)
        y = jnp.concatenate([z6, z9], axis=-1)
        for j, f in enumerate((256, 256)):
            y = ConvBNReLU(w(f), 3, dt, name=f"dec6_conv{j}")(y, train)
        z6 = _deconv2x(w(128), dt, "decoder6_upsampler")(y)

        z3 = DeconvBlock(w(512), dt, name="decoder3_a")(z3, train)
        z3 = DeconvBlock(w(256), dt, name="decoder3_b")(z3, train)
        z3 = DeconvBlock(w(128), dt, name="decoder3_c")(z3, train)
        y = jnp.concatenate([z3, z6], axis=-1)
        for j, f in enumerate((128, 128)):
            y = ConvBNReLU(w(f), 3, dt, name=f"dec3_conv{j}")(y, train)
        z3 = _deconv2x(w(64), dt, "decoder3_upsampler")(y)

        z0 = ConvBNReLU(w(32), 3, dt, name="decoder0_a")(x, train)
        z0 = ConvBNReLU(w(64), 3, dt, name="decoder0_b")(z0, train)
        cat = jnp.concatenate([z0, z3], axis=-1)
        y = ConvBNReLU(w(64), 3, dt, name="head_a")(cat, train)
        y = ConvBNReLU(w(64), 3, dt, name="head_b")(y, train)
        logits = conv(self.n_classes, (1, 1, 1), dtype=dt,
                      name="out_conv")(y)
        if self.dtc:
            # second header (`decoder00_header`, `unetr.py:379-384`);
            # outputs ordered (out_tanh, out_seg) like the reference's
            # `UNETR_DTC.forward` (`unetr.py:404-407`)
            y2 = ConvBNReLU(w(64), 3, dt, name="head2_a")(cat, train)
            y2 = ConvBNReLU(w(64), 3, dt, name="head2_b")(y2, train)
            seg2 = conv(self.n_classes, (1, 1, 1), dtype=dt,
                        name="out_conv2")(y2)
            return (jnp.tanh(logits).astype(jnp.float32),
                    seg2.astype(jnp.float32))
        return logits.astype(jnp.float32), z0
