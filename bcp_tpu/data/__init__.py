"""Host-side data pipelines (HDF5 volumes, augmentation, two-stream
semi-supervised batching, device prefetch)."""

from bcp_tpu.data.sampler import (ThreeStreamBatchSampler,
                                  TwoStreamBatchSampler,
                                  two_stream_batches)
from bcp_tpu.data.datasets import (
    LAHeartDataset,
    ACDCDataset,
    PancreasDataset,
    build_dataset,
)
from bcp_tpu.data.feed import BCPBatchFeeder

__all__ = [
    "ThreeStreamBatchSampler", "TwoStreamBatchSampler",
    "two_stream_batches",
    "LAHeartDataset", "ACDCDataset", "PancreasDataset", "build_dataset",
    "BCPBatchFeeder",
]
