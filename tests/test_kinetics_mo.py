"""Kinetics (Eyring/RCMC/populations) and MO analysis."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.workflows.kinetics import (
    eyring_rate,
    kinetic_priorities,
    populations,
    rate_matrix,
    rcmc_contract,
)
from multioptpy_tpu.workflows.mapper import EQNode, Network, TSEdge


@pytest.fixture
def toy_network():
    nodes = [EQNode(np.zeros((2, 3)), -1.00),
             EQNode(np.ones((2, 3)), -0.99),
             EQNode(np.full((2, 3), 2.0), -0.90)]
    edges = [TSEdge(0, 1, np.zeros((2, 3)), -0.985),   # tiny barrier 0<->1
             TSEdge(1, 2, np.zeros((2, 3)), -0.90)]    # large barrier 1<->2
    return Network(nodes=nodes, edges=edges)


def test_eyring_magnitudes():
    # kBT/h at 300 K is ~6.2e12 1/s; zero barrier returns the prefactor
    assert eyring_rate(0.0, 300.0) == pytest.approx(6.25e12, rel=0.01)
    # 20 kcal/mol barrier at 300 K: ~ 1e-2..1e0 1/s range
    k = eyring_rate(20.0 / 627.509, 300.0)
    assert 1e-4 < k < 1e2


def test_rate_matrix_columns_sum_to_zero(toy_network):
    k = rate_matrix(toy_network)
    np.testing.assert_allclose(k.sum(axis=0), 0.0, atol=1e-3 * np.abs(k).max())


def test_populations_conserved(toy_network):
    k = rate_matrix(toy_network)
    p0 = np.array([1.0, 0.0, 0.0])
    p = populations(k, p0, 1e-12)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)


def test_rcmc_lumps_fast_states(toy_network):
    k = rate_matrix(toy_network)
    res = rcmc_contract(k, time_scale=1.0)
    # 0 and 1 equilibrate fast over the tiny barrier -> lumped together
    members = [set(s) for s in res.superstates]
    assert any({0, 1} <= s for s in members)


def test_kinetic_priorities_normalized(toy_network):
    p = kinetic_priorities(toy_network, reaction_time=1e-10)
    assert p.shape == (3,)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-8)
    assert p[0] > p[2]  # far state kinetically inaccessible at short time


class TestMO:
    def test_sqm_orbitals_water(self):
        from multioptpy_tpu.analysis.mo import density_matrix, sqm_orbitals
        from multioptpy_tpu.calculators.sqm import SQM
        from multioptpy_tpu.units import ANGSTROM2BOHR

        calc = SQM()
        coords = jnp.asarray(np.array([
            [0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
            [0.0, -0.7572, -0.4692]]) * ANGSTROM2BOHR)
        z = jnp.array([8, 1, 1])
        orb = sqm_orbitals(calc, coords, z)
        assert orb.energies.shape == (12,)
        assert orb.occupations.sum() == pytest.approx(8.0, abs=1e-6)
        # electron count from the density matrix: tr(P S) = N_elec
        p = density_matrix(orb)
        assert np.trace(p @ orb.overlap) == pytest.approx(8.0, abs=1e-6)

    def test_nro_detects_rearrangement(self):
        from multioptpy_tpu.analysis.mo import natural_reaction_orbitals
        from multioptpy_tpu.calculators.sqm import SQM

        calc = SQM()
        z = jnp.array([1, 1])
        c1 = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.4]])
        c2 = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.0]])
        w, v = natural_reaction_orbitals(calc, c1, c2, z)
        assert np.abs(w[0]) > 1e-3  # stretching H2 rearranges density
