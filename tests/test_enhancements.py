"""Line search, TRIM, scaling/locking, mode following, perturbation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.steppers.enhancements import (
    backtracking_linesearch,
    componentwise_scaling,
    coordinate_locking,
    mode_following_direction,
    perturb_move,
    trim_step,
)


def test_linesearch_shrinks_overshoot():
    # quadratic bowl: full Newton overshoot x -> scaled back
    energy = lambda x: 0.5 * jnp.sum(x ** 2)
    coords = jnp.array([1.0, 1.0])
    g0 = coords
    move = -3.0 * coords  # overshoots the minimum badly (E increases)
    scaled = backtracking_linesearch(energy, coords, move, energy(coords),
                                     g0)
    e_after = float(energy(coords + scaled))
    assert e_after < float(energy(coords))

    good_move = -coords  # exact Newton: accepted at full length
    kept = backtracking_linesearch(energy, coords, good_move,
                                   energy(coords), g0)
    np.testing.assert_allclose(np.asarray(kept), np.asarray(good_move),
                               atol=1e-12)


def test_trim_respects_trust_and_descends(rng):
    n = 6
    a = rng.normal(size=(n, n))
    h = jnp.asarray(a @ a.T + n * np.eye(n))
    g = jnp.asarray(rng.normal(size=n))
    step = trim_step(g, h, jnp.asarray(0.1))
    assert float(jnp.linalg.norm(step)) <= 0.1 * 1.001
    assert float(jnp.dot(step, g)) < 0.0

    # negative mode with saddle_order=1: TRIM ascends along it
    evals = np.abs(rng.normal(size=n)) + 0.5
    evals[0] = -1.0
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    h2 = jnp.asarray(q @ np.diag(evals) @ q.T)
    x = jnp.asarray(rng.normal(size=n)) * 0.2
    for _ in range(50):
        step = trim_step(h2 @ x, h2, jnp.asarray(0.2), saddle_order=1)
        x = x + step
    assert float(jnp.linalg.norm(x)) < 1e-6  # converged to the saddle


def test_scaling_and_locking():
    move = jnp.array([0.5, -2.0, 0.1])
    np.testing.assert_allclose(
        np.asarray(componentwise_scaling(move, 1.0)), [0.5, -1.0, 0.1])
    lock = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(coordinate_locking(move, lock)), [0.5, 0.0, 0.1])


def test_mode_following_by_overlap(rng):
    n = 5
    a = rng.normal(size=(n, n))
    h = jnp.asarray(a @ a.T)
    d, v = np.linalg.eigh(np.asarray(h))
    ref = jnp.asarray(v[:, 3] + 0.05 * rng.normal(size=n))
    mode, eigval = mode_following_direction(h, reference_mode=ref)
    assert abs(float(jnp.dot(mode, jnp.asarray(v[:, 3])))) > 0.99


def test_perturbation_scale(rng):
    move = jnp.array([1.0, 0.0, 0.0])
    out = perturb_move(move, jax.random.PRNGKey(0), magnitude=1e-3)
    assert float(jnp.linalg.norm(out - move)) < 5e-3


class TestDiisFamily:
    def test_gdiis_accelerates_quadratic(self, rng):
        import jax.numpy as jnp
        from multioptpy_tpu.steppers.diis import diis_init, gdiis_step

        n = 8
        a = rng.normal(size=(n, n))
        h = jnp.asarray(a @ a.T + n * np.eye(n))
        x = jnp.asarray(rng.normal(size=n))
        st = diis_init(n, history=5)
        for _ in range(15):
            g = h @ x
            plain = -0.2 * g
            move, st = gdiis_step(st, x, plain, plain)
            x = x + move
        assert float(jnp.linalg.norm(x)) < 1e-3

    def test_ediis_adiis_simplex(self, rng):
        import jax.numpy as jnp
        from multioptpy_tpu.steppers.diis import (
            adiis_coefficients, ediis_coefficients)

        m, d = 5, 12
        xs = jnp.asarray(rng.normal(size=(m, d)))
        gs = jnp.asarray(rng.normal(size=(m, d)))
        es = jnp.asarray(rng.normal(size=m))
        mask = jnp.ones(m, bool)
        for fn in (ediis_coefficients, adiis_coefficients):
            c = fn(es, xs, gs, mask)
            assert float(jnp.sum(c)) == pytest.approx(1.0, abs=1e-6)
            assert float(jnp.min(c)) >= 0.0

    def test_c2diis_coefficients(self, rng):
        import jax.numpy as jnp
        from multioptpy_tpu.steppers.diis import c2diis_coefficients

        e = jnp.asarray(rng.normal(size=(4, 10)))
        mask = jnp.ones(4, bool)
        c = c2diis_coefficients(e, mask)
        assert float(jnp.sum(c)) == pytest.approx(1.0, abs=1e-8)
        # residual not worse than the best single error vector
        res = float(jnp.linalg.norm(c @ e))
        best_single = min(float(jnp.linalg.norm(e[i])) for i in range(4))
        assert res <= best_single + 1e-8


class TestGediisKdiis:
    def _quadratic(self, rng, dim=12):
        a = rng.normal(size=(dim, dim))
        h = a @ a.T + dim * np.eye(dim)
        x0 = jnp.asarray(rng.normal(size=dim))
        return h, x0

    def test_gediis_converges_quadratic(self, rng):
        import jax.numpy as jnp
        from multioptpy_tpu.steppers.diis import gediis_init, gediis_step

        h, x = self._quadratic(rng)
        hj = jnp.asarray(h)
        st = gediis_init(x.shape[0])
        for _ in range(40):
            g = hj @ x
            e = 0.5 * x @ hj @ x
            # stable base step: lambda_max(h) ~ 60, SD needs < 2/lambda_max
            plain = -0.02 * g
            move, st = gediis_step(st, x, e, g, plain)
            assert np.all(np.isfinite(np.asarray(move)))
            x = x + move
        assert float(jnp.linalg.norm(hj @ x)) < 1e-3

    def test_kdiis_converges_quadratic_faster_than_sd(self, rng):
        import jax.numpy as jnp
        from multioptpy_tpu.steppers.diis import kdiis_init, kdiis_step

        h, x0 = self._quadratic(rng)
        hj = jnp.asarray(h)
        x = x0
        st = kdiis_init(x.shape[0])
        for _ in range(40):
            g = hj @ x
            move, st = kdiis_step(st, x, g, -0.05 * g)
            assert np.all(np.isfinite(np.asarray(move)))
            x = x + move
        gn_kdiis = float(jnp.linalg.norm(hj @ x))
        # plain SD with the same base step
        x = x0
        for _ in range(40):
            x = x - 0.05 * (hj @ x)
        gn_sd = float(jnp.linalg.norm(hj @ x))
        assert gn_kdiis < gn_sd  # Krylov Newton beats the raw step
        assert gn_kdiis < 1e-3

    def test_driver_integration_all_variants(self):
        import jax.numpy as jnp
        from multioptpy_tpu.calculators.lj import LennardJones
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

        calc = LennardJones()
        coords = jnp.asarray([[0.0, 0.0, 0.0], [6.5, 0.0, 0.0],
                              [3.2, 5.6, 0.0]])
        z = jnp.array([18, 18, 18])
        energies = {}
        for dv in (None, "gediis", "kdiis"):
            res = optimize(calc, coords, z, config=OptimizeConfig(
                method="rfo_bfgs", nsteps=60, diis_variant=dv))
            assert bool(res.converged), dv
            energies[dv] = float(res.energy)
        # all land in the same LJ trimer minimum
        assert abs(energies["gediis"] - energies[None]) < 1e-6
        assert abs(energies["kdiis"] - energies[None]) < 1e-6


class TestCrsMfRsirfo:
    def test_crsirfo_holds_bond_constraint(self):
        import jax.numpy as jnp
        from multioptpy_tpu.calculators.lj import LennardJones
        from multioptpy_tpu.constraints import Constraints
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

        calc = LennardJones()
        coords = jnp.asarray([[0.0, 0.0, 0.0], [6.0, 0.0, 0.0],
                              [3.0, 5.4, 0.0]])
        z = jnp.array([18, 18, 18])
        d0 = 6.0  # constrain bond 1-2 at its starting length (Bohr)
        cons = Constraints(bonds=[(1, 2, None)])  # hold current value
        res = optimize(calc, coords, z, constraints=cons,
                       config=OptimizeConfig(method="crsirfo_bfgs",
                                             nsteps=60))
        d12 = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
        assert d12 == pytest.approx(d0, abs=1e-6)   # constraint held
        # the unconstrained DOFs relaxed: atom 3 found its LJ distance
        d13 = float(jnp.linalg.norm(res.coords[0] - res.coords[2]))
        assert 5.0 < d13 < 8.5
        assert float(res.energy) < float(calc.energy(coords, z))

    def test_crsirfo_matches_projected_rfo_minimum(self):
        import jax.numpy as jnp
        from multioptpy_tpu.calculators.lj import LennardJones
        from multioptpy_tpu.constraints import Constraints
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

        calc = LennardJones()
        coords = jnp.asarray([[0.0, 0.0, 0.0], [6.0, 0.0, 0.0],
                              [3.0, 5.4, 0.0]])
        z = jnp.array([18, 18, 18])
        es = {}
        for m in ("crsirfo_bfgs", "rfo_bfgs"):
            cons = Constraints(bonds=[(1, 2, None)])
            res = optimize(calc, coords, z, constraints=cons,
                           config=OptimizeConfig(method=m, nsteps=60))
            es[m] = float(res.energy)
        assert es["crsirfo_bfgs"] == pytest.approx(es["rfo_bfgs"], abs=1e-7)

    def test_mf_rsirfo_finds_mb_saddle(self):
        import jax.numpy as jnp
        from multioptpy_tpu.calculators.model_surfaces import (
            MB_TS_AB, MullerBrown)
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

        calc = MullerBrown()
        # start displaced from the AB saddle
        coords = jnp.asarray([[MB_TS_AB[0] + 0.08, MB_TS_AB[1] - 0.05, 0.0]])
        z = jnp.array([1])
        res = optimize(calc, coords, z, config=OptimizeConfig(
            method="mf_rsirfo_bofill", nsteps=80, saddle_order=1,
            fc_count=5, project_tr_rot=False,
            max_force=1e-7, rms_force=5e-8,
            max_displacement=1e-5, rms_displacement=5e-6))
        xy = np.asarray(res.coords[0, :2])
        np.testing.assert_allclose(xy, MB_TS_AB, atol=2e-4)


def test_eve_stepper_converges():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    calc = LennardJones()
    coords = jnp.asarray([[0.0, 0.0, 0.0], [7.4, 0.0, 0.0]])
    z = jnp.array([18, 18])
    res = optimize(calc, coords, z, config=OptimizeConfig(
        method="eve", nsteps=400, delta=2.0,
        max_force=5e-5, rms_force=3e-5,
        max_displacement=5e-3, rms_displacement=3e-3))
    d = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
    # UFF Ar r_min = 3.868 ang = 7.31 bohr
    assert d == pytest.approx(7.31, abs=0.05)


def test_runaway_guard_stops_diverging_search():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.model_surfaces import MullerBrown
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    calc = MullerBrown()
    # far up the exponential wall; P-RFO climbs and diverges
    coords = jnp.asarray([[1.5, 2.0, 0.0]])
    z = jnp.array([1])
    res = optimize(calc, coords, z, config=OptimizeConfig(
        method="mf_rsirfo_bofill", nsteps=500, saddle_order=1, fc_count=3,
        project_tr_rot=False))
    assert res.n_iterations < 500   # guard fired well before the budget
    assert not bool(res.converged)


def test_dic_rsirfo_optimizes_water_and_matches_cartesian():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.sqm import SQM
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
    from multioptpy_tpu.units import ANGSTROM2BOHR

    calc = SQM()
    coords = jnp.asarray(np.array([
        [0.0, 0.0, 0.0], [0.0, 1.1, -0.5], [0.0, -1.0, -0.65]])
        * ANGSTROM2BOHR * 1.25)
    z = jnp.array([8, 1, 1])
    res_dic = optimize(calc, coords, z, config=OptimizeConfig(
        method="dic_rsirfo_bfgs", nsteps=80))
    assert bool(res_dic.converged)
    res_cart = optimize(calc, coords, z, config=OptimizeConfig(
        method="rfo_bfgs", nsteps=80))
    assert float(res_dic.energy) == pytest.approx(float(res_cart.energy),
                                                  abs=1e-6)


def test_gan_and_rl_steppers_optimize_lj():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    calc = LennardJones()
    coords = jnp.asarray([[0.0, 0.0, 0.0], [7.8, 0.0, 0.0]])
    z = jnp.array([18, 18])
    e0 = float(calc.energy(coords, z))
    for method in ("gan", "rl"):
        res = optimize(calc, coords, z, config=OptimizeConfig(
            method=method, nsteps=300, delta=30.0,
            max_force=5e-5, rms_force=3e-5,
            max_displacement=2e-2, rms_displacement=1e-2))
        d = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
        assert float(res.energy) < e0, method       # descended
        assert np.isfinite(float(res.energy)), method
        assert d == pytest.approx(7.31, abs=0.3), method


def test_geodesic_correct_move():
    import jax.numpy as jnp
    from multioptpy_tpu.coords.internals import (InternalCoordinates,
                                                 detect_primitives)
    from multioptpy_tpu.steppers.enhancements import geodesic_correct_move

    # bent water-like triatomic; bond-only internals
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.8, 0.0],
                          [1.7, -0.5, 0.0]])
    z = np.array([8, 1, 1])
    b, a, t = detect_primitives(np.asarray(coords), z)
    ic = InternalCoordinates(b, np.zeros((0, 3), int),
                             np.zeros((0, 4), int), 3)
    move = jnp.asarray([0.0, 0.2, 0.0, 0.0, -0.15, 0.05,
                        -0.1, 0.0, 0.0])
    corrected = geodesic_correct_move(move, coords, ic)
    assert np.all(np.isfinite(np.asarray(corrected)))
    # the geodesic endpoint preserves bond CHANGES prescribed by B dx to
    # first order: q(x + corrected) ~ q(x) + B move
    q0 = np.asarray(ic.q_flat(coords.reshape(-1)))
    q_pred = q0 + np.asarray(ic.b_matrix(coords) @ move)
    q_geo = np.asarray(ic.q_flat((coords.reshape(-1) + corrected)))
    np.testing.assert_allclose(q_geo, q_pred, atol=2e-2)
    # zero move is a fixed point
    zero = geodesic_correct_move(jnp.zeros(9), coords, ic)
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-10)


def test_mass_weighted_rfo_and_switching():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    calc = LennardJones()
    coords = jnp.asarray([[0.0, 0.0, 0.0], [6.5, 0.0, 0.0],
                          [3.2, 5.6, 0.0]])
    z = jnp.array([18, 18, 18])
    ref = optimize(calc, coords, z,
                   config=OptimizeConfig(method="rfo_bfgs", nsteps=60))
    # mw-prefixed quasi-Newton
    res_mw = optimize(calc, coords, z,
                      config=OptimizeConfig(method="mwrfo_bfgs", nsteps=80))
    assert bool(res_mw.converged)
    assert float(res_mw.energy) == pytest.approx(float(ref.energy), abs=1e-7)
    # mwsd engine
    res_sd = optimize(calc, coords, z, config=OptimizeConfig(
        method="mwsd", nsteps=400, delta=3e3,
        max_force=5e-5, rms_force=3e-5,
        max_displacement=2e-2, rms_displacement=1e-2))
    assert float(res_sd.energy) < float(calc.energy(coords, z))
    # fire -> rfo sigmoid switching
    res_sw = optimize(calc, coords, z, config=OptimizeConfig(
        method="rfo_bfgs", switch_method="fire", nsteps=120))
    assert bool(res_sw.converged)
    assert float(res_sw.energy) == pytest.approx(float(ref.energy), abs=1e-7)


@pytest.mark.parametrize("variant", ["ediis", "adiis", "c2diis"])
def test_new_diis_engines_drive_optimization(variant):
    """EDIIS/ADIIS/C2DIIS as driveable step engines
    (ref: Optimizer/{ediis,adiis,c2diis}.py — round-1 had only the
    coefficient functions)."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.standard_normal((4, 3)) * 4.0 + 7.0)
    z = jnp.array([18, 18, 18, 18])
    res = optimize(LennardJones(), coords, z,
                   config=OptimizeConfig(method="rfo_fsb", nsteps=60,
                                         diis_variant=variant))
    e = res.energy_history
    assert np.all(np.isfinite(np.asarray(res.coords)))
    assert float(e[-1]) <= float(e[0])
