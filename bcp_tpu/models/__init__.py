"""Segmentation models (flax.linen, channels-last NDHWC/NHWC layout)."""

from bcp_tpu.models.vnet3d import VNet3D
from bcp_tpu.models.unet2d import UNet2D
from bcp_tpu.models.unet3d import UNet3D
from bcp_tpu.models.unetr import UNETR
from bcp_tpu.models.factory import create_model, MODEL_REGISTRY

__all__ = ["VNet3D", "UNet2D", "UNet3D", "UNETR", "create_model",
           "MODEL_REGISTRY"]
