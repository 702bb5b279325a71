"""Optional extras inventoried from the reference but dead there:
per-class feature memory + class-wise contrastive loss (SURVEY.md C24 —
both trainers import these in the reference yet never call them,
`LA_BCP_train.py:27`, `ACDC_BCP_train.py:31`) and the unused tail of the
loss library (C12: masked one-hot CE, Dice_Loss, Binary_dice_loss,
softDiceLoss, VAT2d/VAT3d — `code/utils/losses.py:137-388`). Provided for
API completeness and future experimentation."""

from bcp_tpu.extras.contrastive import (
    ClassSelector,
    FeatureMemory,
    contrastive_class_to_class,
)
from bcp_tpu.extras.losses import (
    binary_dice_loss,
    dice_loss_weighted,
    dice_loss_weighted_probs,
    masked_onehot_cross_entropy,
    soft_dice_loss,
    vat_loss_2d,
    vat_loss_3d,
)

__all__ = [
    "ClassSelector",
    "FeatureMemory",
    "contrastive_class_to_class",
    "binary_dice_loss",
    "dice_loss_weighted",
    "dice_loss_weighted_probs",
    "masked_onehot_cross_entropy",
    "soft_dice_loss",
    "vat_loss_2d",
    "vat_loss_3d",
]
