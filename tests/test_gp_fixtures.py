"""GP surrogate stepper and reference-fixture compatibility."""

import glob

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.steppers.gp import gp_init, gp_step


def test_gp_step_minimizes_quadratic(rng):
    n = 4
    h = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, n)))
    x = jnp.asarray(rng.normal(size=n))
    st = gp_init(n, history=8)
    for _ in range(12):
        e = 0.5 * float(x @ h @ x)
        g = h @ x
        mv, st = gp_step(st, x, e, g, lengthscale=2.0, max_step=1.0)
        x = x + mv
    assert float(jnp.linalg.norm(x)) < 1e-4


def test_gp_posterior_interpolates(rng):
    from multioptpy_tpu.steppers.gp import GpState, gp_posterior_energy

    n, m = 3, 6
    xs = rng.normal(size=(m, n))
    f = lambda x: float(np.sum(np.sin(x)))
    g = lambda x: np.cos(x)
    st = GpState(jnp.asarray(xs), jnp.asarray([f(x) for x in xs]),
                 jnp.asarray([g(x) for x in xs]),
                 jnp.asarray(m, jnp.int32))
    # posterior reproduces the training energies
    for i in range(m):
        e_hat = float(gp_posterior_energy(jnp.asarray(xs[i]), st,
                                          lengthscale=1.5))
        assert e_hat == pytest.approx(f(xs[i]), abs=1e-4)


REFERENCE_FIXTURES = sorted(glob.glob("/root/reference/test/*.xyz"))


@pytest.mark.parametrize("path", REFERENCE_FIXTURES,
                         ids=[p.split("/")[-1] for p in REFERENCE_FIXTURES])
def test_reference_fixtures_parse_and_evaluate(path):
    """Every reference test fixture loads and evaluates on the LJ backend
    (fixture-level compatibility with the reference's test inputs)."""
    from multioptpy_tpu.calculators import LennardJones
    from multioptpy_tpu.io import read_xyz
    from multioptpy_tpu.periodic import symbols_to_z
    from multioptpy_tpu.units import ANGSTROM2BOHR

    symbols, coords_ang = read_xyz(path)
    z = symbols_to_z(symbols)
    assert len(symbols) == coords_ang.shape[0] > 0
    calc = LennardJones()
    e, g = calc.energy_and_gradient(
        jnp.asarray(coords_ang * ANGSTROM2BOHR), jnp.asarray(z))
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(g)))
