"""RS-PRFO, block Hessian updates, optax steppers through the driver."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.calculators.model_surfaces import MB_TS_AB, MullerBrown
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.periodic import UFF_VDW_R
from multioptpy_tpu.steppers.rfo import rs_prfo_step

RMIN = float(UFF_VDW_R[18])
TIGHT = dict(max_force=1e-6, rms_force=7e-7, max_displacement=1e-4,
             rms_displacement=7e-5)


@pytest.fixture(scope="module")
def ar3():
    c = np.array([[0.0, 0.0, 0.0], [RMIN * 1.1, 0.0, 0.0],
                  [RMIN * 0.5, RMIN * 0.95, 0.05]])
    return jnp.asarray(c), jnp.array([18, 18, 18])


def test_prfo_step_on_quadratic_saddle(rng):
    n = 6
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    evals = np.abs(rng.normal(size=n)) + 0.5
    evals[0] *= -1.0
    h = jnp.asarray(q @ np.diag(evals) @ q.T)
    x = jnp.asarray(rng.normal(size=n)) * 0.5

    for _ in range(40):
        g = h @ x
        step, aux = rs_prfo_step(g, h, jnp.asarray(0.3), saddle_order=1)
        x = x + step
    assert float(jnp.linalg.norm(x)) < 1e-8  # found the saddle at origin


def test_prfo_driver_muller_brown_saddle():
    calc = MullerBrown()
    z = jnp.array([1])
    guess = jnp.array([[MB_TS_AB[0] + 0.06, MB_TS_AB[1] - 0.04, 0.0]])
    res = optimize(calc, guess, z, config=OptimizeConfig(
        method="rsprfo_bofill", saddle_order=1, nsteps=100, fc_count=3,
        init_hessian="exact", trust_radius_ang=0.1, max_force=1e-7,
        rms_force=7e-8, max_displacement=1e-5, rms_displacement=7e-6))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.coords[0, :2]), MB_TS_AB,
                               atol=1e-5)


def test_block_fsb_driver(ar3):
    coords, z = ar3
    res = optimize(LennardJones(), coords, z, config=OptimizeConfig(
        method="rfo_block_fsb", nsteps=200, **TIGHT))
    assert bool(res.converged)
    d01 = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
    assert d01 == pytest.approx(RMIN, rel=5e-3)


@pytest.mark.parametrize("method", ["adam", "adabelief"])
def test_optax_steppers_descend(ar3, method):
    coords, z = ar3
    res = optimize(LennardJones(), coords, z, config=OptimizeConfig(
        method=method, nsteps=120, delta=2.0,
        max_force=1e-5, rms_force=7e-6, max_displacement=1e-2,
        rms_displacement=7e-3))
    # Adam-family converges slowly; require monotone-ish descent
    assert res.energy_history[-1] < res.energy_history[0] - 1e-5
