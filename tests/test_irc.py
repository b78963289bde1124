"""IRC on the Muller-Brown surface: both branches reach the right minima."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.drivers.irc import (
    IRCConfig,
    initial_displacements,
    irc,
    mass_weighted_modes,
)


@pytest.fixture(scope="module")
def ts():
    coords = jnp.array([[MB_TS_AB[0], MB_TS_AB[1], 0.0]])
    z = jnp.array([1])  # hydrogen mass for the walker
    return MullerBrown(), coords, z


class TestSaddleAnalysis:
    def test_one_imaginary_mode(self, ts):
        calc, coords, z = ts
        h = calc.hessian(coords, z)
        w, v, sm = mass_weighted_modes(h, coords, z)
        w = np.asarray(w)
        assert w[0] < -1e-8          # one imaginary mode
        assert np.sum(w < -1e-8) == 1

    def test_initial_displacements_opposite(self, ts):
        calc, coords, z = ts
        h = calc.hessian(coords, z)
        xf, xb = initial_displacements(h, coords, z, step_ang_amu=0.05)
        df = np.asarray(xf - coords)
        db = np.asarray(xb - coords)
        np.testing.assert_allclose(df, -db, atol=1e-12)
        assert np.linalg.norm(df) == pytest.approx(0.05, rel=1e-6)


@pytest.mark.parametrize("method", ["euler", "lqa", "rk4"])
def test_irc_reaches_both_minima(ts, method):
    calc, coords, z = ts
    res = irc(calc, coords, z, config=IRCConfig(
        method=method, step_size=0.05, n_steps=150, grad_threshold=2e-5,
        init_displacement=0.05))
    ends = [np.asarray(res.forward_path[-1, 0, :2]),
            np.asarray(res.backward_path[-1, 0, :2])]
    targets = [np.asarray(MB_MIN_A), np.asarray(MB_MIN_B)]
    # one branch to A, the other to B (order depends on the mode sign)
    d = np.array([[np.linalg.norm(e - t) for t in targets] for e in ends])
    best = min(d[0, 0] + d[1, 1], d[0, 1] + d[1, 0])
    assert best < 0.05
    # energies decrease monotonically along each branch (until convergence)
    for es in (res.forward_energies, res.backward_energies):
        diffs = np.diff(es[: np.argmin(es) + 1])
        assert np.all(diffs < 1e-10)


def test_meta_irc_walks_downhill_to_minimum():
    """meta-IRC (ref: irc.py:328): single-direction relaxation path from a
    NON-stationary point follows the mass-weighted gradient to the nearest
    minimum."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators import get_calculator
    from multioptpy_tpu.drivers.irc import IRCConfig, meta_irc

    calc = get_calculator("lj")
    z = jnp.array([18, 18])
    start = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 8.2]])  # stretched
    res = meta_irc(calc, start, z, IRCConfig(method="euler", step_size=0.3,
                                             n_steps=150))
    e = np.asarray(res.forward_energies)
    e = e[np.isfinite(e)]
    assert e[-1] < float(res.ts_energy)           # went downhill
    c_end = np.asarray(res.forward_path[-1])
    r_end = float(np.linalg.norm(c_end[0] - c_end[1]))
    assert abs(r_end - 7.17) < 0.5   # LJ Ar2 minimum ~ 2^(1/6) sigma
