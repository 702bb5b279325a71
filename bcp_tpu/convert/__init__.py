"""torch checkpoint interop: reference `.pth` -> flax variables, and
flax -> reference `state_dict` (so TPU-trained weights run under the
reference's own eval scripts)."""

from bcp_tpu.convert.torch_ckpt import (
    convert_state_dict,
    export_state_dict,
    load_torch_checkpoint,
)

__all__ = ["convert_state_dict", "export_state_dict",
           "load_torch_checkpoint"]
