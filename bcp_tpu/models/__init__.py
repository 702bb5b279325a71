"""Segmentation models (flax.linen, channels-last NDHWC/NHWC layout)."""

from bcp_tpu.models.vnet3d import VNet3D
from bcp_tpu.models.unet2d import UNet2D
from bcp_tpu.models.factory import create_model, MODEL_REGISTRY

__all__ = ["VNet3D", "UNet2D", "create_model", "MODEL_REGISTRY"]
