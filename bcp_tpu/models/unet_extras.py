"""Dead-net tail of the reference's `networks/unet.py` (C7 footnote).

The reference file co-locates five classes that no entry point constructs
(`code/networks/unet.py:259-510`): `Sep_UNet_2d` (:259), `GradReverse` /
`GradReverseLayer` (:318-340), `net_D` (:341-359), `UNet_2dBCP` (:361),
`UNet_tsne` (:379) and the trilinear deep-supervision `UNet_3D` (:435-510).
They are ported here for complete zoo parity — kept out of ``unet2d.py``
so the live ACDC net stays lean. TPU notes:

- channels-last layouts (NHWC / NDHWC), like every model in the package;
- `GradReverse` (a torch ``autograd.Function``) becomes a
  ``jax.custom_vjp`` — composable with optax/``jax.grad`` directly;
- torch's ``Upsample(mode='trilinear')`` (align_corners=False) maps to
  ``jax.image.resize(method='trilinear')`` — both use half-pixel source
  coordinates (oracle-tested against torch in test_model_zoo.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcp_tpu.models.layers import TorchBatchNorm, conv, torch_kernel_init
from bcp_tpu.models.unet2d import UNet2D


# --------------------------------------------------------------------------
# GradReverse (`unet.py:318-340`)

@jax.custom_vjp
def grad_reverse(x: jax.Array, lambd: float) -> jax.Array:
    """Identity forward, ``-lambd``-scaled gradient backward — the
    adversarial gradient-reversal layer (`unet.py:318-331`)."""
    return x


def _gr_fwd(x, lambd):
    return x, lambd


def _gr_bwd(lambd, g):
    return (-lambd * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


# --------------------------------------------------------------------------
# MLP heads shared by Sep_UNet_2d / UNet_tsne (`unet.py:273-302,393-421`)

def _dense(features: int, name: str) -> nn.Dense:
    return nn.Dense(features, kernel_init=torch_kernel_init, name=name)


class _MLPHead(nn.Module):
    """Linear -> BatchNorm1d -> ReLU -> Linear (projection / prediction
    heads, `unet.py:273-285`)."""
    feat_dim: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = _dense(self.feat_dim, "fc0")(x)
        x = TorchBatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
            x, not train)
        x = nn.relu(x)
        return _dense(self.feat_dim, "fc1")(x)


class _SelectorHead(nn.Module):
    """Linear -> BatchNorm1d -> LeakyReLU(0.2) -> Linear(1) (the per-class
    contrastive selectors, `unet.py:286-302`)."""
    feat_dim: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = _dense(self.feat_dim, "fc0")(x)
        x = TorchBatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
            x, not train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return _dense(1, "fc1")(x)


class _ContrastiveHeads(nn.Module):
    """The projection/prediction heads + 2x4 class selectors that
    Sep_UNet_2d and UNet_tsne carry (`unet.py:272-302`). Grouped so both
    nets share one implementation; exposed via the parent's methods."""
    feat_dim: int = 32
    n_selector_classes: int = 4

    def setup(self):
        self.projection_head = _MLPHead(self.feat_dim)
        self.prediction_head = _MLPHead(self.feat_dim)
        self.selectors = [_SelectorHead(self.feat_dim)
                          for _ in range(self.n_selector_classes)]
        self.selectors_memory = [_SelectorHead(self.feat_dim)
                                 for _ in range(self.n_selector_classes)]

    def __call__(self, features, train: bool = False):
        # touch every head once so init materialises all parameters,
        # exactly like torch's eager registration
        proj = self.projection_head(features, train)
        pred = self.prediction_head(proj, train)
        sel = [s(proj, train) for s in self.selectors]
        sel_m = [s(proj, train) for s in self.selectors_memory]
        return proj, pred, sel, sel_m


class SepUNet2D(nn.Module):
    """`Sep_UNet_2d` (`unet.py:259-316`): the standard 2-D U-Net body
    plus contrastive heads; ``__call__`` returns ``(feature, output)``
    with feature = the bottleneck map maxpooled twice (3x3, stride 2,
    VALID — torch MaxPool2d(3, 2) semantics)."""
    n_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    feat_dim: int = 32
    dtype: object = None

    def setup(self):
        self.body = UNet2D(n_classes=self.n_classes,
                           feature_chns=self.feature_chns,
                           dropout=self.dropout, dtype=self.dtype,
                           expose_bottleneck=True)
        self.heads = _ContrastiveHeads(self.feat_dim)

    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        logits, _x_last, bottleneck = self.body(x, train)
        f = nn.max_pool(bottleneck, (3, 3), (2, 2), padding="VALID")
        f = nn.max_pool(f, (3, 3), (2, 2), padding="VALID")
        return f, logits

    def init_heads(self, features, train: bool = False):
        """Materialise/apply the head stack on (N, 16) features."""
        return self.heads(features, train)

    def forward_projection_head(self, features, train: bool = False):
        return self.heads.projection_head(features, train)

    def forward_prediction_head(self, features, train: bool = False):
        return self.heads.prediction_head(features, train)


class UNet2DBCP(nn.Module):
    """`UNet_2dBCP` (`unet.py:361-377`): plain U-Net returning logits
    only (the reference `Decoder` returns just the output there)."""
    n_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        logits, _ = UNet2D(n_classes=self.n_classes,
                           feature_chns=self.feature_chns,
                           dropout=self.dropout, dtype=self.dtype,
                           name="body")(x, train)
        return logits


class UNetTsne(nn.Module):
    """`UNet_tsne` (`unet.py:379-433`): U-Net with `Decoder_tsne` —
    returns ``(output, x_last)`` — plus the contrastive heads."""
    n_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    feat_dim: int = 32
    dtype: object = None

    def setup(self):
        self.body = UNet2D(n_classes=self.n_classes,
                           feature_chns=self.feature_chns,
                           dropout=self.dropout, dtype=self.dtype)
        self.heads = _ContrastiveHeads(self.feat_dim)

    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        return self.body(x, train)

    def init_heads(self, features, train: bool = False):
        return self.heads(features, train)

    def forward_projection_head(self, features, train: bool = False):
        return self.heads.projection_head(features, train)

    def forward_prediction_head(self, features, train: bool = False):
        return self.heads.prediction_head(features, train)


class NetD(nn.Module):
    """`net_D` (`unet.py:341-359`): whole-batch MLP discriminator over the
    flattened Sep_UNet_2d feature — Linear/Tanh x2 then Linear/Sigmoid.
    Input (b_size, 3, 3, 256) channels-last (the reference's
    ``x.view(1, -1)`` flattens NCHW; the permutation is absorbed by the
    learned first Linear). Pairs with :func:`grad_reverse` for the
    adversarial use the reference sketched (`unet.py:356` commented GRL)."""
    b_size: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        total = self.b_size * 256 * 3 * 3
        x = x.reshape(1, -1)
        x = jnp.tanh(_dense(total // 2, "fc0")(x))
        x = jnp.tanh(_dense(total // 4, "fc1")(x))
        return nn.sigmoid(_dense(1, "fc2")(x))


# --------------------------------------------------------------------------
# trilinear deep-supervision UNet_3D (`unet.py:435-510`)

def resize_trilinear(x: jax.Array, scale: Sequence[int]) -> jax.Array:
    """torch ``Upsample/interpolate(mode='trilinear')`` for NDHWC inputs:
    both default to align_corners=False, i.e. half-pixel source
    coordinates — exactly ``jax.image.resize(method='trilinear')``."""
    n, d, h, w, c = x.shape
    out = (n, d * scale[0], h * scale[1], w * scale[2], c)
    return jax.image.resize(x, out, method="trilinear")


class UNet3DTrilinear(nn.Module):
    """`UNet_3D` (`unet.py:435-510`): single-conv encoder levels
    (conv -> maxpool 2 -> relu), trilinear-upsampled single-conv decoder
    with additive skips, and four softmaxed deep-supervision maps. Note
    the reference's quirk, kept: every map upsamples H/W one level past
    the input, so outputs are (D, 2H, 2W); train=True returns
    (map1..map4) coarse-to-fine, else map4 only."""
    n_classes: int = 2
    feat: Sequence[int] = (32, 64, 128, 256)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        ft = self.feat
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def enc(x, f, name):
            x = conv(f, (3, 3, 3), name=name, dtype=self.dtype)(x)
            return nn.relu(nn.max_pool(x, (2, 2, 2), (2, 2, 2)))

        out = enc(x, ft[0], "encoder1")
        t1 = out
        out = enc(out, ft[1], "encoder2")
        t2 = out
        out = enc(out, ft[2], "encoder3")
        t3 = out
        out = enc(out, ft[3], "encoder4")

        def head(x, scale, name):
            y = conv(self.n_classes, (1, 1, 1), name=name,
                     dtype=self.dtype)(x)
            y = resize_trilinear(y, scale)
            return jax.nn.softmax(y.astype(jnp.float32), axis=-1)

        output1 = head(out, (16, 32, 32), "map1")
        out = nn.relu(resize_trilinear(
            conv(ft[2], (3, 3, 3), name="decoder2", dtype=self.dtype)(out),
            (2, 2, 2))) + t3
        output2 = head(out, (8, 16, 16), "map2")
        out = nn.relu(resize_trilinear(
            conv(ft[1], (3, 3, 3), name="decoder3", dtype=self.dtype)(out),
            (2, 2, 2))) + t2
        output3 = head(out, (4, 8, 8), "map3")
        out = nn.relu(resize_trilinear(
            conv(ft[0], (3, 3, 3), name="decoder4", dtype=self.dtype)(out),
            (2, 2, 2))) + t1
        out = nn.relu(resize_trilinear(
            conv(2, (3, 3, 3), name="decoder5", dtype=self.dtype)(out),
            (2, 2, 2)))
        output4 = head(out, (1, 2, 2), "map4")
        if train:
            return output1, output2, output3, output4
        return output4
