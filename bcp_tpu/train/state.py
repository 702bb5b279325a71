"""TrainState: the one pytree that holds everything a step touches.

Student params + BN stats, teacher (EMA) params + BN stats, optimizer state
and the step counter live together so the entire self-train update — the
reference's model/ema_model/optimizer triple plus the iteration counter
(`LA_BCP_train.py:198-270`) — is a single pure function
``state, metrics = step(state, batch, key)`` compiled by XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from bcp_tpu.config import Config


@struct.dataclass
class TrainState:
    step: jax.Array                      # int32 scalar
    params: Any
    batch_stats: Any                     # {} for instance-norm models
    teacher_params: Any
    teacher_batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: Config, stage: str):
    """Pre-train: constant base_lr. LA self-train: base * 0.1**(step//2500)
    (`LA_BCP_train.py:273-276`); others constant."""
    if stage == "self" and cfg.lr_decay_every:
        every = cfg.lr_decay_every

        def sched(step):
            return cfg.base_lr * jnp.power(
                0.1, (step // every).astype(jnp.float32))
        return sched
    return cfg.base_lr


def build_optimizer(cfg: Config, stage: str) -> optax.GradientTransformation:
    """torch-faithful optimizers.

    SGD path replicates `optim.SGD(lr, momentum=0.9, weight_decay=1e-4)`
    (`LA_BCP_train.py:135,218`): decoupled L2 is added to the raw gradient
    *before* the momentum trace, exactly torch's ordering. Adam path is the
    pancreas `optim.Adam(lr=1e-3)` (`pancreas/dataloaders.py:182`).
    """
    sched = lr_schedule(cfg, stage)
    if cfg.optimizer == "sgd":
        parts = []
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.trace(decay=cfg.momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(sched))
        return optax.chain(*parts)
    if cfg.optimizer == "adam":
        return optax.adam(sched)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


@functools.lru_cache(maxsize=64)
def _jitted_model_init(model, example_shape: tuple):
    """One cached-jitted program per (model, shape): eagerly,
    ``model.init`` plus the two teacher tree-copies dispatch hundreds of
    tiny one-off XLA programs (none persistently cacheable), which
    dominates process start-up on slow hosts — measured ~10 s for even a
    16^3 V-Net on the single-core CI host vs ~4 s compile (then ~0.1 s
    from the persistent cache) for the fused program. The lru_cache (flax
    Modules hash by config) keeps repeated ``init_state`` calls — the
    test suite's favourite pattern — from re-tracing it each time."""

    def _init(key: jax.Array):
        x = jnp.zeros(example_shape, jnp.float32)
        pkey, dkey = jax.random.split(key)
        variables = model.init({"params": pkey, "dropout": dkey}, x,
                               train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        # Teacher gets distinct buffers (not aliases): the train step
        # donates the whole state, and XLA rejects donating one buffer
        # twice. jnp.copy survives jit output buffer assignment (verified
        # by the donated-step tests, which error loudly on aliasing).
        return (params, batch_stats,
                jax.tree_util.tree_map(jnp.copy, params),
                jax.tree_util.tree_map(jnp.copy, batch_stats))

    return jax.jit(_init)


def init_state(model, cfg: Config, key: jax.Array,
               tx: optax.GradientTransformation,
               example_shape: Optional[tuple] = None) -> TrainState:
    """Initialise student == teacher (the reference loads both from the
    same pre-train checkpoint, `LA_BCP_train.py:220-222`). Jitted — see
    :func:`_jitted_model_init`; the optimizer state compiles separately
    (``tx`` carries fresh closures per ``build_optimizer`` call, so it
    can't key a cache)."""
    if example_shape is None:
        example_shape = (1, *cfg.patch_size, cfg.in_channels)
    params, batch_stats, tparams, tstats = _jitted_model_init(
        model, tuple(example_shape))(key)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        teacher_params=tparams,
        teacher_batch_stats=tstats,
        opt_state=jax.jit(tx.init)(params),
    )


def has_batch_stats(state: TrainState) -> bool:
    return len(jax.tree_util.tree_leaves(state.batch_stats)) > 0
