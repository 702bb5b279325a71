"""Mean-teacher EMA updates as pure pytree ops.

The reference has two flavours, both reproduced:

- ``ema_update``: parameters only (`utils/BCP_utils.py:78-81`,
  `pancreas/pancreas_utils.py:299-302`) — the LA / pancreas behaviour.
  Torch caveat: in the reference the teacher's BN *running buffers* are not
  frozen — ``ema_model.train()`` + forward under ``no_grad``
  (`LA_BCP_train.py:225,240-242`) still updates running stats with each
  unlabeled batch, so the torch teacher's buffers drift. This repo's
  ``steps._teacher_forward`` deliberately discards those updates. The
  divergence is inert: no pipeline ever consumes teacher buffers in
  inference mode — the teacher always forwards in train mode (batch stats),
  and eval runs on the *student* — pinned by
  ``tests/test_steps.py::test_teacher_batch_stats_inert`` and recorded in
  ``docs/DESIGN.md``.
- ``ema_update_full``: the whole variable tree including BN buffers
  (`ACDC_BCP_train.py:123-129` interpolates the entire state_dict).

On TPU these are single fused elementwise programs over the parameter
pytree; they run inside the jitted train step (no per-tensor Python loop as
in the reference).
"""

from __future__ import annotations

import jax


def ema_update(teacher_params, student_params, alpha: float):
    """teacher <- alpha * teacher + (1 - alpha) * student (params pytree)."""
    return jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1.0 - alpha) * s,
        teacher_params, student_params)


# The full-state flavour is the same tree op applied to a larger pytree
# (params + batch_stats); kept as a named alias for call-site clarity.
ema_update_full = ema_update


def copy_tree(src):
    """Detached copy with fresh buffers — `parameter_sharing`
    (`utils/BCP_utils.py:88-91`). Fresh buffers matter because train steps
    donate their state; aliased leaves would be donated twice."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.copy, src)


def ema_update_two_students(teacher_params, params1, params2, alpha: float):
    """teacher <- alpha*teacher + (1-alpha)/2*(s1 + s2)
    — `update_ema_students` (`utils/BCP_utils.py:83-86`)."""
    return jax.tree_util.tree_map(
        lambda t, a, b: alpha * t + 0.5 * (1.0 - alpha) * (a + b),
        teacher_params, params1, params2)
