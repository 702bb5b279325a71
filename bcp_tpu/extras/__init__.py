"""Optional extras inventoried from the reference but dead there
(SURVEY.md C24): per-class feature memory + class-wise contrastive loss.
Both trainers import these in the reference yet never call them
(`LA_BCP_train.py:27`, `ACDC_BCP_train.py:31`); provided here for API
completeness and future experimentation."""

from bcp_tpu.extras.contrastive import (
    ClassSelector,
    FeatureMemory,
    contrastive_class_to_class,
)

__all__ = ["ClassSelector", "FeatureMemory", "contrastive_class_to_class"]
