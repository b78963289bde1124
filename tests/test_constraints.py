"""Constraints: projection, SHAKE, frozen atoms, constrained opt, scan."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.constraints import Constraints
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.periodic import UFF_VDW_R
from multioptpy_tpu.units import ANGSTROM2BOHR
from multioptpy_tpu.workflows import relaxed_scan

RMIN = float(UFF_VDW_R[18])
TIGHT = dict(max_force=1e-6, rms_force=7e-7, max_displacement=1e-4,
             rms_displacement=7e-5)


@pytest.fixture(scope="module")
def ar3():
    c = np.array([[0.0, 0.0, 0.0], [RMIN * 1.1, 0.0, 0.0],
                  [RMIN * 0.5, RMIN * 0.95, 0.1]])
    return jnp.asarray(c), jnp.array([18, 18, 18])


class TestProjection:
    def test_projected_gradient_tangent_to_constraint(self, ar3, rng):
        coords, z = ar3
        cons = Constraints(bonds=[(1, 2, None)], n_atoms=3)
        g = jnp.asarray(rng.normal(size=(3, 3)))
        pg = cons.project_gradient(g, coords)
        b = cons.jacobian(coords)
        # projected gradient has no component along the constraint row
        np.testing.assert_allclose(np.asarray(b @ pg.reshape(-1)), 0.0,
                                   atol=1e-10)

    def test_shake_restores_target(self, ar3):
        coords, z = ar3
        cons = Constraints(bonds=[(1, 2, 4.2 * 0.52917721067)], n_atoms=3)
        tgt = cons.targets(coords)
        shaken = cons.shake(coords + 0.3, tgt)
        d = float(jnp.linalg.norm(shaken[0] - shaken[1]))
        assert d == pytest.approx(4.2, abs=1e-8)

    def test_fixed_atom_mask(self, ar3):
        coords, z = ar3
        cons = Constraints(fixed_atoms=[1], n_atoms=3)
        g = jnp.ones((3, 3))
        pg = cons.project_gradient(g, coords)
        np.testing.assert_allclose(np.asarray(pg[0]), 0.0)
        np.testing.assert_allclose(np.asarray(pg[1:]), 1.0)


class TestConstrainedOptimization:
    def test_bond_constrained_minimum(self, ar3):
        coords, z = ar3
        target_ang = RMIN * 1.2 * 0.52917721067  # hold bond 1-2 stretched
        cons = Constraints(bonds=[(1, 2, target_ang)])
        res = optimize(LennardJones(), coords, z,
                       config=OptimizeConfig(method="rfo_fsb", nsteps=200,
                                             **TIGHT),
                       constraints=cons)
        d12 = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
        assert d12 * 0.52917721067 == pytest.approx(target_ang, abs=1e-6)
        # other bonds relax to their free minimum
        d13 = float(jnp.linalg.norm(res.coords[0] - res.coords[2]))
        assert d13 == pytest.approx(RMIN, rel=2e-2)

    def test_fixed_atoms_do_not_move(self, ar3):
        coords, z = ar3
        cons = Constraints(fixed_atoms=[1, 2])
        res = optimize(LennardJones(), coords, z,
                       config=OptimizeConfig(method="fire", nsteps=200,
                                             max_force=5e-6, rms_force=4e-6),
                       constraints=cons)
        np.testing.assert_allclose(np.asarray(res.coords[:2]),
                                   np.asarray(coords[:2]), atol=1e-12)


class TestRelaxedScan:
    def test_bond_scan_profile(self, ar3):
        coords, z = ar3
        rmin_ang = RMIN * 0.52917721067
        res = relaxed_scan(
            LennardJones(), coords, z, "bond", [1, 2],
            start=rmin_ang * 0.92, stop=rmin_ang * 1.25, n_points=5,
            config=OptimizeConfig(method="rfo_fsb", nsteps=120, **TIGHT))
        assert res.energies.shape == (5,)
        assert np.all(res.converged)
        # profile has a minimum near r = rmin
        i_min = int(np.argmin(res.energies))
        assert 0 < i_min < 4
        # scanned bond hits its target at every point
        for geom, val in zip(res.geometries, res.values):
            d = np.linalg.norm(geom[0] - geom[1]) * 0.52917721067
            assert d == pytest.approx(val, abs=1e-6)


def test_fbond_constraint_holds_fragment_distance():
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.constraints import Constraints
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    calc = LennardJones()
    # two Ar2 fragments
    coords = jnp.asarray([[0.0, 0.0, 0.0], [7.3, 0.0, 0.0],
                          [3.6, 9.5, 0.0], [10.9, 9.5, 0.0]])
    z = jnp.array([18, 18, 18, 18])
    cons = Constraints(fbonds=[([1, 2], [3, 4], None)])  # hold centroid dist
    d0 = float(jnp.linalg.norm(jnp.mean(coords[:2], axis=0)
                               - jnp.mean(coords[2:], axis=0)))
    res = optimize(calc, coords, z, constraints=cons,
                   config=OptimizeConfig(method="rfo_bfgs", nsteps=60))
    c = res.coords
    d = float(jnp.linalg.norm(jnp.mean(c[:2], axis=0)
                              - jnp.mean(c[2:], axis=0)))
    assert d == pytest.approx(d0, abs=1e-5)
    assert float(res.energy) < float(calc.energy(coords, z))


def test_projection_vector_blocks_motion(rng):
    import jax.numpy as jnp
    from multioptpy_tpu.constraints import Constraints

    n = 3
    coords = jnp.asarray(rng.normal(size=(n, 3)))
    v = np.zeros(9)
    v[2] = 1.0  # block z-motion of atom 1
    cons = Constraints(projection_vectors=[v], n_atoms=n)
    g = jnp.asarray(rng.normal(size=(n, 3)))
    g_proj = cons.project_gradient(g, coords)
    assert abs(float(g_proj[0, 2])) < 1e-12
    # other components untouched (no other constraints)
    np.testing.assert_allclose(np.asarray(g_proj[1:]), np.asarray(g[1:]),
                               atol=1e-12)


def test_atoms_pair_projection():
    """'atoms_pair' constraint kind (ref: constraint_condition.py:425):
    the pair's mutual approach direction is projected out of the
    gradient."""
    import jax.numpy as jnp
    from multioptpy_tpu.constraints.project import Constraints

    coords = jnp.asarray(np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0],
                                   [0.0, 3.0, 0.0]]))
    c = Constraints(atoms_pairs=[(1, 2)], n_atoms=3)
    assert c.has_any()
    # gradient pulling the pair together along x
    g = jnp.zeros((3, 3)).at[0, 0].set(1.0).at[1, 0].set(-1.0)
    pg = np.asarray(c.project_gradient(g, coords))
    # the anti-symmetric pair component along the bond is gone
    assert abs(pg[0, 0] - pg[1, 0]) < 1e-12
    # an unrelated gradient is untouched
    g2 = jnp.zeros((3, 3)).at[2, 1].set(1.0)
    pg2 = np.asarray(c.project_gradient(g2, coords))
    np.testing.assert_allclose(pg2, np.asarray(g2), atol=1e-14)


class TestRelaxedScanMulti:
    def test_two_targets_in_lockstep(self, ar3):
        """Reference -scan semantics (relaxed_scan.py:45-104): several
        targets advance along their own linspace simultaneously; every
        point satisfies BOTH constraints."""
        from multioptpy_tpu.workflows.relaxed_scan import relaxed_scan_multi

        coords, z = ar3
        rmin_ang = RMIN * 0.52917721067
        targets = [("bond", [1, 2], rmin_ang * 0.95, rmin_ang * 1.15),
                   ("bond", [2, 3], rmin_ang * 1.00, rmin_ang * 1.20)]
        res = relaxed_scan_multi(
            LennardJones(), coords, z, targets, n_points=4,
            config=OptimizeConfig(method="rfo_fsb", nsteps=120, **TIGHT))
        assert res.values.shape == (4, 2)
        assert np.all(res.converged)
        for geom, (v12, v23) in zip(res.geometries, res.values):
            d12 = np.linalg.norm(geom[0] - geom[1]) * 0.52917721067
            d23 = np.linalg.norm(geom[1] - geom[2]) * 0.52917721067
            assert d12 == pytest.approx(v12, abs=1e-6)
            assert d23 == pytest.approx(v23, abs=1e-6)

    def test_first_only_reseeds_from_input(self, ar3):
        """-fo: every point seeds from the INPUT structure; the scan still
        hits its targets (ref: relaxed_scan.py:119 first_only)."""
        from multioptpy_tpu.workflows.relaxed_scan import relaxed_scan_multi

        coords, z = ar3
        rmin_ang = RMIN * 0.52917721067
        res = relaxed_scan_multi(
            LennardJones(), coords, z,
            [("bond", [1, 2], rmin_ang * 0.95, rmin_ang * 1.2)],
            n_points=3, first_only=True,
            config=OptimizeConfig(method="rfo_fsb", nsteps=120, **TIGHT))
        for geom, (v12,) in zip(res.geometries, res.values):
            d12 = np.linalg.norm(geom[0] - geom[1]) * 0.52917721067
            assert d12 == pytest.approx(v12, abs=1e-6)
