"""Units, periodic tables, geometry utilities, xyz I/O, test calculators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu import periodic, units
from multioptpy_tpu.geometry import (
    align_to,
    kabsch_rotation,
    pairwise_distances,
    project_gradient_tr_rot,
    project_hessian_tr_rot,
    rmsd,
    tr_rot_basis,
)
from multioptpy_tpu.io.xyz import format_xyz, read_trajectory, read_xyz, write_trajectory


def test_units_match_reference_values():
    # ref: multioptpy/Parameters/unit_values.py:2-19
    assert units.HARTREE2KCALMOL == 627.509
    assert units.BOHR2ANGSTROM == 0.52917721067
    assert abs(units.KB_HARTREE - 3.16681e-6) < 1e-10


def test_periodic_tables():
    assert periodic.symbol_to_z("C") == 6
    assert periodic.symbol_to_z("Rn") == 86
    assert periodic.z_to_symbol(1) == "H"
    # ref values: Parameters/covalent_radii.py, atomic_mass.py
    assert periodic.COVALENT_RADII_1_ANG[6] == 0.75
    assert periodic.COVALENT_RADII_2_ANG[8] == 0.57
    assert periodic.COVALENT_RADII_3_ANG[7] == 0.54
    assert abs(periodic.MASS_AMU[6] - 12.0) < 1e-12
    assert abs(periodic.MASS_AMU[86] - 222.0175782) < 1e-7
    np.testing.assert_allclose(
        periodic.covalent_radii([6, 8], unit="ang"), [0.75, 0.63])


def test_tr_rot_basis_orthonormal(rng):
    coords = jnp.asarray(rng.normal(size=(5, 3)))
    basis = tr_rot_basis(coords)
    gram = basis @ basis.T
    np.testing.assert_allclose(gram, np.eye(6), atol=1e-10)


def test_tr_rot_basis_linear_molecule():
    # CO2-like linear geometry: only 5 independent TR/rot vectors
    coords = jnp.array([[0.0, 0.0, -2.2], [0.0, 0.0, 0.0], [0.0, 0.0, 2.2]])
    basis = tr_rot_basis(coords)
    norms = jnp.linalg.norm(basis, axis=1)
    assert int(jnp.sum(norms > 0.5)) == 5


def test_project_gradient_removes_net_force_torque(rng):
    coords = jnp.asarray(rng.normal(size=(6, 3)) * 2.0)
    grad = jnp.asarray(rng.normal(size=(6, 3)))
    pg = project_gradient_tr_rot(grad, coords)
    np.testing.assert_allclose(jnp.sum(pg, axis=0), 0.0, atol=1e-10)
    centered = coords - jnp.mean(coords, axis=0)
    torque = jnp.sum(jnp.cross(centered, pg), axis=0)
    np.testing.assert_allclose(torque, 0.0, atol=1e-9)


def test_hessian_projection_gives_six_zero_modes(rng):
    coords = jnp.asarray(rng.normal(size=(4, 3)) * 2.0)
    m = rng.normal(size=(12, 12))
    hess = jnp.asarray(m + m.T)
    ph = project_hessian_tr_rot(hess, coords)
    w = np.linalg.eigvalsh(ph)
    assert np.sum(np.abs(w) < 1e-8) >= 6


def test_kabsch_recovers_rotation(rng):
    p = jnp.asarray(rng.normal(size=(7, 3)))
    theta = 0.7
    rot = jnp.array([
        [np.cos(theta), -np.sin(theta), 0.0],
        [np.sin(theta), np.cos(theta), 0.0],
        [0.0, 0.0, 1.0],
    ])
    q = p @ rot.T + jnp.array([1.0, -2.0, 0.5])
    assert float(rmsd(p, q)) < 1e-10
    r = kabsch_rotation(p - p.mean(0), q - q.mean(0))
    assert abs(float(jnp.linalg.det(r)) - 1.0) < 1e-10


def test_xyz_roundtrip(tmp_path):
    symbols = ["O", "H", "H"]
    coords = np.array([[0.0, 0.0, 0.119], [0.0, 0.763, -0.477],
                       [0.0, -0.763, -0.477]])
    path = tmp_path / "w.xyz"
    path.write_text(format_xyz(symbols, coords, "water"))
    s2, c2 = read_xyz(path)
    assert s2 == symbols
    np.testing.assert_allclose(c2, coords, atol=1e-10)

    tpath = tmp_path / "t.xyz"
    frames = np.stack([coords, coords + 0.1])
    write_trajectory(tpath, symbols, frames)
    s3, f3, _ = read_trajectory(tpath)
    assert f3.shape == (2, 3, 3)
    np.testing.assert_allclose(f3[1], coords + 0.1, atol=1e-10)


def test_reference_fixture_parses():
    symbols, coords = read_xyz("/root/reference/test/SN2.xyz")
    assert len(symbols) == coords.shape[0] > 0


class TestCalculators:
    def test_lj_dimer_minimum(self):
        from multioptpy_tpu.calculators import LennardJones
        from multioptpy_tpu.periodic import UFF_VDW_R
        calc = LennardJones()
        z = jnp.array([18, 18])  # Ar2
        rmin = float(UFF_VDW_R[18])
        coords = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, rmin]])
        e, g = calc.energy_and_gradient(coords, z)
        # at r = rmin the gradient should vanish and E = -eps
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-10)
        from multioptpy_tpu.periodic import UFF_VDW_EPS
        np.testing.assert_allclose(float(e), -float(UFF_VDW_EPS[18]), rtol=1e-10)

    def test_lj_gradient_matches_fd(self, rng):
        from multioptpy_tpu.calculators import LennardJones
        calc = LennardJones()
        z = jnp.array([6, 6, 8, 1])
        coords = jnp.asarray(rng.normal(size=(4, 3)) * 3.0 + 4.0)
        _, g = calc.energy_and_gradient(coords, z)
        eps = 1e-6
        for i in range(4):
            for k in range(3):
                cp = coords.at[i, k].add(eps)
                cm = coords.at[i, k].add(-eps)
                fd = (calc.energy(cp, z) - calc.energy(cm, z)) / (2 * eps)
                assert abs(float(g[i, k]) - float(fd)) < 1e-6

    def test_lj_hessian_symmetric(self, rng):
        from multioptpy_tpu.calculators import LennardJones
        calc = LennardJones()
        z = jnp.array([18, 18, 18])
        coords = jnp.asarray(rng.normal(size=(3, 3)) * 2.0 + 5.0)
        h = calc.hessian(coords, z)
        assert h.shape == (9, 9)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h).T, atol=1e-10)
        hn = calc.numerical_hessian(coords, z, step=1e-4)
        np.testing.assert_allclose(np.asarray(hn), np.asarray(h), atol=1e-5)

    def test_emt_copper_dimer(self):
        from multioptpy_tpu.calculators.emt import EMT
        calc = EMT()
        z = jnp.array([29, 29])
        coords = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 4.8]])
        e, g = calc.energy_and_gradient(coords, z)
        assert np.isfinite(float(e))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_tersoff_si_gradient_fd(self, rng):
        from multioptpy_tpu.calculators.tersoff import Tersoff
        calc = Tersoff()
        z = jnp.array([14, 14, 14, 14])
        # near-tetrahedral Si4 cluster, bohr
        coords = jnp.asarray([[0.0, 0.0, 0.0], [4.4, 0.0, 0.0],
                              [2.2, 3.8, 0.0], [2.2, 1.3, 3.6]])
        e, g = calc.energy_and_gradient(coords, z)
        assert float(e) < 0.0  # bound cluster
        eps = 1e-6
        cp = coords.at[1, 0].add(eps)
        cm = coords.at[1, 0].add(-eps)
        fd = (calc.energy(cp, z) - calc.energy(cm, z)) / (2 * eps)
        assert abs(float(g[1, 0]) - float(fd)) < 1e-6
