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


def test_inv_dist_descriptor_rotation_invariant(rng):
    """The reference GPmin fits in inverse-distance space (gpmin.py:223) —
    the surrogate must be invariant under rigid rotation."""
    import jax.numpy as jnp
    from multioptpy_tpu.steppers.gp import inv_dist_descriptor

    phi, p = inv_dist_descriptor(4)
    x = jnp.asarray(rng.standard_normal(12) * 3.0)
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    x_rot = jnp.asarray((np.asarray(x).reshape(4, 3) @ rot.T).reshape(-1))
    assert p == 6
    np.testing.assert_allclose(np.asarray(phi(x)), np.asarray(phi(x_rot)),
                               rtol=1e-12)


def test_gpmin_drives_optimization():
    """'gpmin' as a driveable method (ref: optimizer.py:53 optimizer_mapping
    'gpmin'): LJ trimer energy decreases under the descriptor-space GP
    surrogate minimizer."""
    import jax
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    r = 7.6
    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [r, 0.0, 0.0], [r / 2, r, 0.0]]))
    z = jnp.array([18, 18, 18])
    res = optimize(LennardJones(), coords, z,
                   config=OptimizeConfig(method="gpmin", nsteps=25,
                                         delta=0.6))
    e = res.energy_history
    assert np.all(np.isfinite(np.asarray(res.coords)))
    assert float(e[-1]) < float(e[0])
