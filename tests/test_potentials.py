"""Bias potentials: values, autodiff gradients, param-grads, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.potentials import BiasEngine, available_potentials, get_potential
from multioptpy_tpu.potentials.afir import AFIRPotential, afir_alpha
from multioptpy_tpu.units import ANGSTROM2BOHR, DEG2RAD, HARTREE2KJMOL


def _fd_grad(fn, coords, eps=1e-6):
    g = np.zeros_like(np.asarray(coords))
    for i in range(coords.shape[0]):
        for k in range(3):
            cp = coords.at[i, k].add(eps)
            cm = coords.at[i, k].add(-eps)
            g[i, k] = (float(fn(cp)) - float(fn(cm))) / (2 * eps)
    return g


@pytest.fixture
def water_dimer():
    # two rigid waters ~3 A apart, coords in Bohr
    w = np.array([[0.0, 0.0, 0.22], [0.0, 1.44, -0.9], [0.0, -1.44, -0.9]])
    coords = np.concatenate([w, w + np.array([5.7, 0.0, 0.0])])
    z = np.array([8, 1, 1, 8, 1, 1], dtype=np.int32)
    return jnp.asarray(coords), z


class TestAFIR:
    def test_alpha_sign_and_magnitude(self):
        # gamma=100 kJ/mol must give a positive finite alpha; gamma<0 negative
        a_pos = float(afir_alpha(jnp.asarray(100.0)))
        a_neg = float(afir_alpha(jnp.asarray(-100.0)))
        a_zero = float(afir_alpha(jnp.asarray(0.0)))
        assert a_pos > 0 and np.isfinite(a_pos)
        assert a_neg < 0
        assert a_zero == 0.0

    def test_pull_together(self, water_dimer):
        coords, z = water_dimer
        pot = AFIRPotential(gamma=100.0, fragm_1=[1, 2, 3], fragm_2=[4, 5, 6],
                            element_z=z)
        engine = BiasEngine([pot])
        e, g = engine.energy_and_gradient(coords)
        # positive gamma pushes fragments together: force on fragment 2
        # (x>0 side) points in -x
        force_x_frag2 = -float(jnp.sum(g[3:, 0]))
        assert force_x_frag2 < 0.0
        np.testing.assert_allclose(_fd_grad(engine.total_energy, coords),
                                   np.asarray(g), atol=1e-6)

    def test_param_grad_dE_dgamma(self, water_dimer):
        coords, z = water_dimer
        pot = AFIRPotential(gamma=100.0, fragm_1=[1], fragm_2=[4], element_z=z)
        engine = BiasEngine([pot])
        res = engine.compute(coords)
        dg = float(res.param_grads[0][0])
        eps = 1e-3
        e_p = BiasEngine([AFIRPotential(gamma=100.0 + eps, fragm_1=[1],
                                        fragm_2=[4], element_z=z)]).total_energy(coords)
        e_m = BiasEngine([AFIRPotential(gamma=100.0 - eps, fragm_1=[1],
                                        fragm_2=[4], element_z=z)]).total_energy(coords)
        fd = (float(e_p) - float(e_m)) / (2 * eps)
        assert dg == pytest.approx(fd, rel=1e-4)


class TestRestraints:
    def test_keep_minimum_at_r0(self, water_dimer):
        coords, z = water_dimer
        r0_ang = float(jnp.linalg.norm(coords[0] - coords[3])) / ANGSTROM2BOHR
        pot = get_potential("keep", spring_const=0.5, distance=r0_ang,
                            atom_pair=[1, 4])
        engine = BiasEngine([pot])
        e, g = engine.energy_and_gradient(coords)
        assert abs(float(e)) < 1e-12
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-10)

    def test_keep_gradient_fd(self, water_dimer):
        coords, z = water_dimer
        engine = BiasEngine([get_potential("keep", spring_const=0.5,
                                           distance=2.0, atom_pair=[1, 4])])
        _, g = engine.energy_and_gradient(coords)
        np.testing.assert_allclose(_fd_grad(engine.total_energy, coords),
                                   np.asarray(g), atol=1e-6)

    def test_anharmonic_matches_harmonic_near_min(self):
        coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0 * ANGSTROM2BOHR + 0.01]])
        k, de = 0.8, 0.2
        e_m = BiasEngine([get_potential("keep_anharmonic", spring_const=k,
                                        well_depth=de, distance=2.0,
                                        atom_pair=[1, 2])]).total_energy(coords)
        e_h = BiasEngine([get_potential("keep", spring_const=k, distance=2.0,
                                        atom_pair=[1, 2])]).total_energy(coords)
        assert float(e_m) == pytest.approx(float(e_h), rel=2e-2)

    def test_angle_dihedral_restraints(self, water_dimer):
        coords, z = water_dimer
        eng = BiasEngine([
            get_potential("keep_angle", spring_const=0.3, angle=104.5,
                          atoms=[2, 1, 3]),
            get_potential("keep_dihedral", spring_const=0.1, angle=60.0,
                          atoms=[2, 1, 4, 5]),
        ])
        e, g = eng.energy_and_gradient(coords)
        assert np.isfinite(float(e))
        np.testing.assert_allclose(_fd_grad(eng.total_energy, coords),
                                   np.asarray(g), atol=5e-6)

    def test_dihedral_wrap_periodicity(self):
        # phi0=179 deg vs phi=-179 deg must give a 2-degree penalty, not 358
        c = jnp.asarray([[1.0, -0.1, 0.0], [0.0, 0.0, 0.0],
                         [0.0, 0.0, 1.5], [1.0, 0.1, 1.5]])
        from multioptpy_tpu.potentials.base import _dihedral
        phi = float(_dihedral(c[0], c[1], c[2], c[3]))
        pot = get_potential("keep_dihedral", spring_const=1.0,
                            angle=phi / DEG2RAD - 358.0, atoms=[1, 2, 3, 4])
        e = BiasEngine([pot]).total_energy(c)
        expected = 0.5 * (2.0 * DEG2RAD) ** 2
        assert float(e) == pytest.approx(expected, rel=1e-6)


class TestWellAndMisc:
    def test_well_flat_bottom_zero(self, water_dimer):
        coords, z = water_dimer
        r_ang = float(jnp.linalg.norm(
            jnp.mean(coords[:3], axis=0) - jnp.mean(coords[3:], axis=0))) / ANGSTROM2BOHR
        eng = BiasEngine([get_potential(
            "well", wall_energy=50.0, limits=[r_ang - 2, r_ang - 1,
                                              r_ang + 1, r_ang + 2],
            fragm_1=[1, 2, 3], fragm_2=[4, 5, 6])])
        e, g = eng.energy_and_gradient(coords)
        assert abs(float(e)) < 1e-12
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)

    def test_well_walls_rise(self, water_dimer):
        coords, z = water_dimer
        eng = BiasEngine([get_potential(
            "well", wall_energy=50.0, limits=[0.5, 1.0, 2.0, 2.5],
            fragm_1=[1, 2, 3], fragm_2=[4, 5, 6])])  # centers ~3 A apart -> outside
        e, g = eng.energy_and_gradient(coords)
        assert float(e) > 0.0
        np.testing.assert_allclose(_fd_grad(eng.total_energy, coords),
                                   np.asarray(g), atol=1e-5)

    def test_lj_repulsive_pushes_apart(self, water_dimer):
        coords, z = water_dimer
        eng = BiasEngine([get_potential(
            "lj_repulsive_scale", well_scale=1.0, dist_scale=2.0,
            fragm_1=[1, 2, 3], fragm_2=[4, 5, 6], element_z=z)])
        e, g = eng.energy_and_gradient(coords)
        # dist_scale=2 puts the dimer deep on the repulsive side
        force_x_frag2 = -float(jnp.sum(g[3:, 0]))
        assert force_x_frag2 > 0.0

    def test_value_range_inside_zero(self, water_dimer):
        coords, z = water_dimer
        eng = BiasEngine([get_potential(
            "value_range", upper_const=5.0, lower_const=5.0,
            upper_distance=10.0, lower_distance=0.5,
            fragm_1=[1, 2, 3], fragm_2=[4, 5, 6])])
        # softplus tails (the reference's exact form) decay exponentially
        # inside the range but never hit zero
        assert abs(float(eng.total_energy(coords))) < 1e-6

    def test_metadyn_deposits(self, water_dimer):
        coords, z = water_dimer
        pot = get_potential("gaussian_metadyn", height_kjmol=5.0,
                            width_ang=0.3, atom_pair=[1, 4], max_hills=8)
        eng = BiasEngine([pot])
        assert float(eng.total_energy(coords)) == 0.0
        pot.deposit(float(pot.cv(coords)))
        eng2 = BiasEngine([pot])
        e = float(eng2.total_energy(coords))
        assert e == pytest.approx(5.0 / HARTREE2KJMOL, rel=1e-10)

    def test_engine_sums_and_vmaps(self, water_dimer):
        coords, z = water_dimer
        eng = BiasEngine([
            get_potential("keep", spring_const=0.5, distance=2.0, atom_pair=[1, 4]),
            get_potential("value_range", upper_const=1.0, lower_const=1.0,
                          upper_distance=2.8, lower_distance=0.5,
                          fragm_1=[1, 2, 3], fragm_2=[4, 5, 6]),
        ])
        batch = jnp.stack([coords, coords * 1.05, coords * 0.95])
        e_b, g_b = jax.vmap(eng.energy_and_gradient)(batch)
        assert e_b.shape == (3,) and g_b.shape == batch.shape
        e0, g0 = eng.energy_and_gradient(coords)
        assert float(e_b[0]) == pytest.approx(float(e0))

    def test_registry_lists_potentials(self):
        names = available_potentials()
        for expected in ["afir", "keep", "keep_v2", "keep_angle",
                         "keep_dihedral", "well", "lj_repulsive_scale",
                         "mechano_force", "electrostatic_fragment",
                         "gaussian_metadyn", "value_range", "void_point"]:
            assert expected in names
