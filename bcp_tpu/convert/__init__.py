"""torch checkpoint interop (reference `.pth` -> flax variables)."""

from bcp_tpu.convert.torch_ckpt import (
    convert_state_dict,
    load_torch_checkpoint,
)

__all__ = ["convert_state_dict", "load_torch_checkpoint"]
