"""EMA tree ops and ramp schedules."""

import numpy as np
import pytest

import jax.numpy as jnp

from bcp_tpu.ops import ema, ramps


def test_ema_update():
    t = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    s = {"w": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = ema.ema_update(t, s, 0.99)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.99, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.01, rtol=1e-6)


def test_ema_two_students():
    t = {"w": jnp.full((2,), 1.0)}
    s1 = {"w": jnp.full((2,), 0.0)}
    s2 = {"w": jnp.full((2,), 2.0)}
    out = ema.ema_update_two_students(t, s1, s2, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9 + 0.05 * 2,
                               rtol=1e-6)


def test_copy_tree_detached():
    s = {"w": jnp.ones((2,))}
    out = ema.copy_tree(s)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(s["w"]))


def test_sigmoid_rampup_values():
    # exp(-5 * (1 - t)^2), ramps.py:19-26
    assert float(ramps.sigmoid_rampup(0, 40)) == pytest.approx(
        np.exp(-5.0), rel=1e-5)
    assert float(ramps.sigmoid_rampup(40, 40)) == pytest.approx(1.0)
    assert float(ramps.sigmoid_rampup(100, 40)) == pytest.approx(1.0)
    assert ramps.sigmoid_rampup(10, 0) == 1.0


def test_linear_rampup():
    assert float(ramps.linear_rampup(20, 40)) == pytest.approx(0.5)
    assert float(ramps.linear_rampup(50, 40)) == pytest.approx(1.0)


def test_cosine_rampdown():
    assert float(ramps.cosine_rampdown(0, 10)) == pytest.approx(1.0)
    assert float(ramps.cosine_rampdown(10, 10)) == pytest.approx(0.0, abs=1e-6)
