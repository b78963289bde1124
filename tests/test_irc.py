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


class TestCurvatureProperties:
    """Per-step IRC curvature artifacts (ref: PESAnalyzer/
    calc_irc_curvature.py:80-104, written from IRC/euler.py:411)."""

    def test_irc_result_carries_gradients_and_hessian(self, ts):
        calc, coords, z = ts
        res = irc(calc, coords, z, config=IRCConfig(
            method="euler", step_size=0.05, n_steps=20,
            grad_threshold=2e-5, init_displacement=0.05))
        assert res.forward_gradients is not None
        assert res.forward_gradients.shape == res.forward_path.shape
        assert res.backward_gradients.shape == res.backward_path.shape
        assert res.ts_hessian.shape == (3, 3)

    def test_curvature_table_matches_pointwise_formula(self, ts):
        from multioptpy_tpu.analysis.pes import (
            irc_branch_curvature_table, irc_curvature_properties)
        calc, coords, z = ts
        res = irc(calc, coords, z, config=IRCConfig(
            method="euler", step_size=0.05, n_steps=15,
            grad_threshold=2e-5, init_displacement=0.05))
        masses = np.ones(1)  # H walker: mass 1.008 -> use real mass below
        from multioptpy_tpu.geometry import masses_from_z
        masses = np.asarray(masses_from_z(z))
        table = irc_branch_curvature_table(
            res.forward_gradients, masses, res.ts_hessian, 0.05)
        assert table.shape[0] == res.forward_gradients.shape[0] - 1
        assert np.all(np.isfinite(table))
        # row 1 reproduces the pointwise reference formula exactly
        sm = np.repeat(np.sqrt(masses), 3)
        g_mw = res.forward_gradients.reshape(len(res.forward_gradients), -1) / sm
        h_mw = res.ts_hessian / sm[:, None] / sm[None, :]
        tang, curv, scalar, coup = irc_curvature_properties(
            g_mw[1], g_mw[0], h_mw, 0.05)
        np.testing.assert_allclose(table[0, 0], scalar, rtol=1e-12)
        np.testing.assert_allclose(table[0, 1:], coup, rtol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(tang), 1.0, rtol=1e-12)
        # coupling dimension = number of positive Hessian modes (> 1e-8)
        w = np.linalg.eigvalsh(h_mw)
        assert table.shape[1] - 1 == int(np.sum(w > 1e-8))

    def test_path_bending_angles(self):
        from multioptpy_tpu.analysis.pes import path_bending_angles
        straight = np.stack([np.array([[i * 1.0, 0.0, 0.0]])
                             for i in range(5)])
        a = path_bending_angles(straight)
        np.testing.assert_allclose(a, 180.0, atol=1e-9)  # colinear: u,v oppose
        bent = np.stack([np.array([[0.0, 0.0, 0.0]]),
                         np.array([[1.0, 0.0, 0.0]]),
                         np.array([[1.0, 1.0, 0.0]])])
        a = path_bending_angles(bent)
        np.testing.assert_allclose(a, [90.0], atol=1e-9)

    def test_cli_writes_curvature_csvs(self, tmp_path, ts):
        from multioptpy_tpu.cli import _write_irc_curvature
        calc, coords, z = ts
        res = irc(calc, coords, z, config=IRCConfig(
            method="euler", step_size=0.05, n_steps=15,
            grad_threshold=2e-5, init_displacement=0.05))
        _write_irc_curvature(str(tmp_path), res, np.asarray(z), 0.05)
        fwd = tmp_path / "irc_curvature_properties_forward.csv"
        assert fwd.exists()
        lines = fwd.read_text().splitlines()
        assert lines[0].startswith("Scalar_Curvature,Curvature_Coupling_1")
        assert len(lines) == res.forward_gradients.shape[0]  # header + S-1
        assert (tmp_path / "path_bending_angle_forward.csv").exists()
