"""Sigmoid engine-switching semantics vs the reference thresholds
(ref: optimizer.py:582-617 switch_move_vector: pure first-order above
RMS force 0.05, pure quasi-Newton below 0.005, sigmoid blend with
steepness 10 / offset 0.5 in between) — VERDICT weak #9: the blend
weights were previously asserted in comments only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.base import Calculator
from multioptpy_tpu.drivers.optimize import (
    OptimizeConfig, init_state, make_step_fn)
from multioptpy_tpu.steppers.rfo import rs_rfo_step

K_DIAG = 0.8   # harmonic constant per DOF


class Quadratic(Calculator):
    """E = 0.5 k |x|^2 — gradient k x, exact Hessian k I."""

    def energy(self, coords, z):
        return 0.5 * K_DIAG * jnp.sum(coords ** 2)


def _one_step_move(x0_scale, delta=1.0):
    """Run ONE driver step with switch_method='sd' from x0 = scale * dirs;
    return (move, g0, hessian, trust)."""
    rng = np.random.default_rng(8)
    dirs = rng.standard_normal((3, 3))
    dirs /= np.abs(dirs).max()
    coords = jnp.asarray(dirs * x0_scale)
    z = jnp.array([6, 6, 6])
    calc = Quadratic()
    config = OptimizeConfig(method="rfo_fsb", switch_method="sd",
                            delta=delta, init_hessian="exact",
                            project_tr_rot=False)
    state = init_state(coords, z, calc, None, config)
    step = jax.jit(make_step_fn(calc, z, None, config))
    new = step(state)
    move = np.asarray(new.coords - state.coords).reshape(-1)
    g0 = K_DIAG * np.asarray(coords).reshape(-1)
    h = np.asarray(state.hessian)
    trust = float(state.trust_radius)
    return move, g0, h, trust


def _expected(move_kind, g0, h, trust, delta=1.0):
    qn = np.asarray(rs_rfo_step(jnp.asarray(g0), jnp.asarray(h),
                                jnp.asarray(trust))[0])
    sd = -delta * g0
    rms = np.sqrt(np.mean(g0 ** 2))
    if move_kind == "auto":
        if rms > 0.05:
            w = 1.0
        elif rms <= 0.005:
            w = 0.0
        else:
            x_j = (rms - 0.005) / (0.05 - 0.005)
            w = 1.0 / (1.0 + np.exp(-10.0 * (x_j - 0.5)))
        return w * sd + (1.0 - w) * qn
    raise ValueError


@pytest.mark.parametrize("scale", [
    0.2,      # rms force > 0.05 -> pure first-order (sd)
    0.004,    # rms force < 0.005 -> pure quasi-Newton
    0.035,    # mid-range -> sigmoid blend
    0.02,     # mid-range, other side of the offset
])
def test_switching_blend_matches_reference_formula(scale):
    move, g0, h, trust = _one_step_move(scale)
    expected = _expected("auto", g0, h, trust)
    np.testing.assert_allclose(move, expected, rtol=1e-8, atol=1e-12)


def test_switching_thresholds_are_sharp():
    """Just above the upper threshold the move IS the sd step; just below
    the lower threshold it IS the quasi-Newton step."""
    move_hi, g0, h, trust = _one_step_move(0.2)
    np.testing.assert_allclose(move_hi, -g0, rtol=1e-10)

    move_lo, g0, h, trust = _one_step_move(0.004)
    qn = np.asarray(rs_rfo_step(jnp.asarray(g0), jnp.asarray(h),
                                jnp.asarray(trust))[0])
    np.testing.assert_allclose(move_lo, qn, rtol=1e-8)
