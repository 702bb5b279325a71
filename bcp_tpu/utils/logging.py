"""Logging + TensorBoard metric writer.

Same observability surface as the reference (SURVEY.md §5): a per-stage
``log.txt`` + stdout logger (`LA_BCP_train.py:363-370`) and tensorboardX
scalars under the reference's tag names (`LA_BCP_train.py:164-166,260-263`).
tensorboardX is optional — the writer degrades to a no-op if missing.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax


def enable_compile_cache(path: str = "/tmp/bcp_tpu_jax_cache"):
    """Persistent XLA compile cache: the fused self-train step takes
    minutes to compile cold; cached compiles make process restarts (and
    each trainer stage) near-instant. Idempotent, safe to call anywhere
    before the first jit execution."""
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              5)
    except Exception:
        pass

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


def setup_logging(log_dir: str, name: str = "bcp_tpu") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"{name}:{log_dir}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S")
    fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    logger.propagate = False
    return logger


class MetricWriter:
    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir is not None and SummaryWriter is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._writer = SummaryWriter(log_dir)

    def scalar(self, tag: str, value, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def image(self, tag: str, img, step: int):
        if self._writer is not None:
            self._writer.add_image(tag, img, step)

    def images(self, tag: str, imgs, step=None):
        """Batched grid — ``add_images`` (`LA_BCP_train.py:321,340`
        passes no global_step)."""
        if self._writer is not None:
            self._writer.add_images(tag, imgs, step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


class AverageMeter:
    """`pancreas/pancreas_utils.py:90-108`."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0
        return self

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val
        self.count += n
        self.avg = self.sum / self.count
        return self


class Measures:
    """Keyed AverageMeter group with tensorboard/log emission —
    `pancreas/pancreas_utils.py:111-150,223-251` (`CutPreMeasures` /
    `CutmixFTMeasures` are instances with specific key sets)."""

    def __init__(self, keys, writer: "MetricWriter", logger, prefix: str
                 = "pretrain"):
        self.keys = list(keys)
        self.measures = {k: AverageMeter() for k in self.keys}
        self.writer = writer
        self.logger = logger
        self.prefix = prefix

    def reset(self):
        for v in self.measures.values():
            v.reset()

    def update(self, **values):
        for k, v in values.items():
            self.measures[k].update(float(v))

    def log(self, epoch: int, step: int):
        parts = ", ".join(f"{k}: {self.measures[k].val:.4f}"
                          for k in self.keys)
        if self.logger is not None:
            self.logger.info("Epoch : %d, %s", epoch, parts)
        for k, m in self.measures.items():
            self.writer.scalar(f"{self.prefix}/{k}", m.avg, step)
        self.writer.flush()


def cut_pre_measures(writer, logger):
    """`CutPreMeasures` (`pancreas_utils.py:122-150`)."""
    return Measures(["ce_loss", "dice_loss", "loss_all", "train_dice"],
                    writer, logger)


def cutmix_ft_measures(writer, logger):
    """`CutmixFTMeasures` (`pancreas_utils.py:223-251`)."""
    return Measures(["mix_loss_lab", "mix_loss_unlab", "loss_all"],
                    writer, logger)
