"""Two-stage BCP mean-teacher training."""

from bcp_tpu.train.state import TrainState, init_state, build_optimizer
from bcp_tpu.train.steps import make_pretrain_step, make_selftrain_step

__all__ = ["TrainState", "init_state", "build_optimizer",
           "make_pretrain_step", "make_selftrain_step"]
