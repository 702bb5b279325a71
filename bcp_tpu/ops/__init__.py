"""Pure, jittable algorithm kernels for BCP."""

from bcp_tpu.ops.masks import (
    cuboid_mask,
    rect_mask,
    grid_mask,
    slab_mask,
    mix,
)
from bcp_tpu.ops.losses import (
    softmax_probs,
    masked_dice_loss,
    dice_loss_per_class,
    masked_cross_entropy,
    cross_entropy_mean,
    mix_loss_volume,
    mix_loss_slice,
    sup_loss,
    softmax_mse,
)
from bcp_tpu.ops.ema import ema_update, ema_update_full, copy_tree
from bcp_tpu.ops.ramps import sigmoid_rampup, linear_rampup, cosine_rampdown
from bcp_tpu.ops.cc import (
    connected_components,
    largest_cc,
    largest_cc_per_class,
    get_cut_mask,
    get_multiclass_mask,
)

__all__ = [
    "cuboid_mask", "rect_mask", "grid_mask", "slab_mask", "mix",
    "softmax_probs", "masked_dice_loss", "dice_loss_per_class",
    "masked_cross_entropy", "cross_entropy_mean", "mix_loss_volume",
    "mix_loss_slice", "sup_loss", "softmax_mse",
    "ema_update", "ema_update_full", "copy_tree",
    "sigmoid_rampup", "linear_rampup", "cosine_rampdown",
    "connected_components", "largest_cc", "largest_cc_per_class",
    "get_cut_mask", "get_multiclass_mask",
]
