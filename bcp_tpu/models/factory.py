"""Model registry + constructor.

TPU equivalent of `net_factory` / `BCP_net` (`code/networks/net_factory.py`):
string -> configured flax module. There is no .cuda()/teacher-detach here —
device placement is jit's job and the teacher is just a second params
pytree (`bcp_tpu.train.state`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from bcp_tpu.models.unet2d import UNet2D
from bcp_tpu.models.unet3d import UNet3D
from bcp_tpu.models.unetr import UNETR
from bcp_tpu.models.vnet3d import VNet3D

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


@register("unet")
def _unet(class_num: int = 4, mode: str = "train", n_filters=None, **kw):
    """`net_factory('unet')` / `BCP_net` -> UNet_2d (`net_factory.py:6-7,14-19`).
    (The reference UNet has dropout always on in train mode.)
    ``n_filters`` scales the whole channel ladder (reference: 16)."""
    if n_filters:
        kw["feature_chns"] = tuple(n_filters * (2 ** i) for i in range(5))
    return UNet2D(n_classes=class_num, **kw)


@register("VNet")
def _vnet(class_num: int = 2, mode: str = "train", **kw):
    """`net_factory('VNet')` (`net_factory.py:8-11`): batchnorm, dropout on
    for training, off for test-mode construction."""
    return VNet3D(n_classes=class_num, normalization="batchnorm",
                  has_dropout=(mode == "train"), **kw)


@register("VNet_pancreas")
def _vnet_pancreas(class_num: int = 2, mode: str = "train", **kw):
    """`pancreas/Vnet.py:92-194` + `create_Vnet` (`pancreas/dataloaders.py:12-19`):
    instancenorm, no dropout by default."""
    return VNet3D(n_classes=class_num, normalization="instancenorm",
                  has_dropout=False, **kw)


@register("unet_3D")
def _unet3d(class_num: int = 2, mode: str = "train", **kw):
    """Residual 3D U-Net (`networks/Unet3D.py:8-92`; zoo model, no
    reference entry point uses it)."""
    return UNet3D(n_classes=class_num, **kw)


@register("unet_3D_dtc")
def _unet3d_dtc(class_num: int = 2, mode: str = "train", **kw):
    """`UNet_DTC` dual-head variant (`networks/Unet3D.py:93-133`)."""
    return UNet3D(n_classes=class_num, n_heads=2, **kw)


@register("unetr")
def _unetr(class_num: int = 2, mode: str = "train", img_shape=(128, 128,
           128), **kw):
    """ViT-encoder UNETR (`networks/unetr.py:194-296`; zoo model)."""
    return UNETR(n_classes=class_num, img_shape=img_shape, **kw)


@register("unetr_dtc")
def _unetr_dtc(class_num: int = 2, mode: str = "train",
               img_shape=(128, 128, 128), **kw):
    """`UNETR_DTC` (`networks/unetr.py:296-407`): UNETR with the dual-task
    tanh level-set head; returns (out_tanh, out_seg)."""
    return UNETR(n_classes=class_num, img_shape=img_shape, dtc=True, **kw)


@register("git_VNet")
def _git_vnet(class_num: int = 2, mode: str = "train",
              normalization: str = "none", **kw):
    """`git_VNet.VNet` (`networks/git_VNet.py:145-240`): identical
    topology to the main V-Net (non-residual ConvBlocks, additive skips,
    single seg output) with the normalization defaulting to 'none' and
    dropout only when constructed with has_dropout=True — zoo model, no
    reference entry point constructs it."""
    return VNet3D(n_classes=class_num, normalization=normalization,
                  has_dropout=kw.pop("has_dropout", False), **kw)


@register("sep_unet_2d")
def _sep_unet_2d(class_num: int = 4, mode: str = "train", **kw):
    """`Sep_UNet_2d` (`networks/unet.py:259-316`; dead in the reference —
    zoo parity entry). Returns (pooled bottleneck feature, logits)."""
    from bcp_tpu.models.unet_extras import SepUNet2D
    return SepUNet2D(n_classes=class_num, **kw)


@register("unet_2d_bcp")
def _unet_2d_bcp(class_num: int = 4, mode: str = "train", **kw):
    """`UNet_2dBCP` (`networks/unet.py:361-377`; dead — zoo parity)."""
    from bcp_tpu.models.unet_extras import UNet2DBCP
    return UNet2DBCP(n_classes=class_num, **kw)


@register("unet_tsne")
def _unet_tsne(class_num: int = 4, mode: str = "train", **kw):
    """`UNet_tsne` (`networks/unet.py:379-433`; dead — zoo parity)."""
    from bcp_tpu.models.unet_extras import UNetTsne
    return UNetTsne(n_classes=class_num, **kw)


@register("net_D")
def _net_d(class_num: int = 2, mode: str = "train", b_size: int = 4, **kw):
    """`net_D` MLP discriminator (`networks/unet.py:341-359`; dead —
    zoo parity). ``class_num`` is ignored (binary sigmoid output)."""
    from bcp_tpu.models.unet_extras import NetD
    return NetD(b_size=b_size, **kw)


@register("unet_3D_trilinear")
def _unet3d_trilinear(class_num: int = 2, mode: str = "train", **kw):
    """Trilinear deep-supervision `UNet_3D` (`networks/unet.py:435-510`;
    dead — zoo parity)."""
    from bcp_tpu.models.unet_extras import UNet3DTrilinear
    return UNet3DTrilinear(n_classes=class_num, **kw)


def create_model(net_type: str, class_num: int, mode: str = "train",
                 compute_dtype=None, **kw):
    """``compute_dtype`` (e.g. jnp.bfloat16) enables mixed precision:
    bf16 convs/norms on the MXU, float32 params and logits."""
    if net_type not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown net_type {net_type!r}; have {sorted(MODEL_REGISTRY)}")
    if compute_dtype is not None:
        kw["dtype"] = compute_dtype
    return MODEL_REGISTRY[net_type](class_num=class_num, mode=mode, **kw)
