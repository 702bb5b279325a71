"""Hyperparameter ramp schedules.

Same math as `code/utils/ramps.py:19-41` (which itself follows the
mean-teacher papers). Written to be host-side floats OR traced scalars, so
they can live inside a jitted step or in the outer loop.

Note: in the reference both trainers compute a consistency weight from
``sigmoid_rampup`` every step but never multiply it into any loss
(`LA_BCP_train.py:246,260`; `ACDC_BCP_train.py:370,395`) — it is logged
only. The trainer here reproduces that logging behaviour.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(-5 * (1 - t)^2) ramp — `ramps.py:19-26`."""
    if rampup_length == 0:
        return 1.0
    current = jnp.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    """`ramps.py:29-35`."""
    if rampup_length == 0:
        return 1.0
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    """`ramps.py:38-41`."""
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1.0)
