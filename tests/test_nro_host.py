"""NRO from host wavefunctions (VERDICT r3 item 7).

The reference's NRO analyzer consumes consecutive wavefunctions from its
QM calculators (WFAnalyzer/MO_analysis.py:7; tblite/Psi4/PySCF). Our
`analysis/mo.py` now accepts MO coefficients + overlap through the
host-bridge contract `_host_wavefunction(coords, z) -> (eps, C, S, occ)`
and reproduces the reference's response-matrix SVD semantics. Verified
(a) against the analytic rotation rate of a mock PySCF-like host, and
(b) LIVE against the reference's own NROAnalysis on identical data.
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

from multioptpy_tpu.analysis.mo import (host_orbitals, nro_along,
                                        nro_response, orbitals_of)
from multioptpy_tpu.calculators.host import HostCalculator

_REF = "/root/reference/multioptpy"

THETA = 0.3


def _rot(a):
    return np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])


class RotatingHost(HostCalculator):
    """PySCF-shaped mock: a 2-orbital wavefunction whose MO coefficients
    rotate with the x displacement of atom 0 (S = I), with linear /
    quadratic orbital-energy trends."""

    def __init__(self):
        super().__init__()

    def _host_energy_gradient(self, coords, z):
        return 0.0, np.zeros_like(np.asarray(coords))

    def _host_wavefunction(self, coords, z):
        s = float(np.asarray(coords)[0, 0])
        eps = np.array([-0.5 + 0.1 * s, 0.2 + 0.05 * s * s])
        return eps, _rot(THETA * s), np.eye(2), np.array([2.0, 0.0])


def test_host_orbitals_roundtrip():
    calc = RotatingHost()
    orb = host_orbitals(calc, np.zeros((2, 3)), np.array([1, 1]))
    np.testing.assert_allclose(orb.coefficients, np.eye(2), atol=1e-14)
    np.testing.assert_allclose(orb.overlap, np.eye(2), atol=1e-14)
    assert orbitals_of(calc, np.zeros((2, 3)),
                       np.array([1, 1])).energies[0] == orb.energies[0]


def test_nro_along_matches_analytic_rotation():
    calc = RotatingHost()
    direction = np.zeros((2, 3))
    direction[0, 0] = 1.0
    res = nro_along(calc, np.zeros((2, 3)), np.array([1, 1]), direction,
                    delta=1e-4)
    # dC/ds = THETA * J (J the 2x2 rotation generator); C0 = S = I, so
    # the response matrix is THETA*J with both singular values |THETA|
    assert res.lambda_sum == pytest.approx(2 * THETA, abs=1e-6)
    np.testing.assert_allclose(res.lambda_singular, [THETA, THETA],
                               atol=1e-6)
    np.testing.assert_allclose(res.d_orbital_energy, [0.1, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(res.d2_orbital_energy, [0.0, 0.1],
                               atol=1e-3)


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference tree not mounted")
def test_nro_live_parity_with_reference(tmp_path):
    """The reference's NROAnalysis on the same rotating mock yields the
    same LAMBDA sum and orbital-energy derivatives as nro_along."""
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    mod = importlib.import_module("multioptpy.WFAnalyzer.MO_analysis")

    class _SP:
        def __init__(self):
            self.overlap_matrix = np.eye(2)
            self._set(0.0)

        def _set(self, s):
            self.orbital_coefficients = _rot(THETA * s)
            self.orbital_energies = np.array([-0.5 + 0.1 * s,
                                              0.2 + 0.05 * s * s])

        def single_point_no_directory(self, geom, el, chmult, method):
            self._set(float(geom[0, 0]))
            return None, None, None

    eng = mod.NROAnalysis(xtb="gfn2", element_list=["H", "H"],
                          electric_charge_and_multiplicity=[0, 1],
                          file_directory=str(tmp_path) + "/")
    move = np.zeros((2, 3))
    move[0, 0] = 1.0
    with contextlib.redirect_stdout(io.StringIO()):
        eng.run(_SP(), np.zeros((2, 3)), move)

    ours = nro_along(RotatingHost(), np.zeros((2, 3)), np.array([1, 1]),
                     move, delta=eng.numerical_delta)
    assert ours.lambda_sum == pytest.approx(eng.LAMBDA_list[0], abs=1e-10)
    np.testing.assert_allclose(ours.d_orbital_energy,
                               eng.first_deriv_orbital_ene_list[0],
                               atol=1e-10)
    np.testing.assert_allclose(ours.d2_orbital_energy,
                               eng.second_deriv_orbital_ene_list[0],
                               atol=1e-8)


def test_nro_response_nontrivial_overlap():
    """With a non-identity AO overlap the response matrix C0^H S dC is
    basis-aware: check SVD invariance under an S-orthonormal C0."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((3, 3))
    s = a @ a.T + 3 * np.eye(3)
    # S-orthonormal C0 (columns): C0^T S C0 = I
    w, v = np.linalg.eigh(s)
    c0 = v @ np.diag(w ** -0.5) @ v.T

    from multioptpy_tpu.analysis.mo import Orbitals
    delta = 1e-3
    gen = np.array([[0.0, -1.0, 0.2], [1.0, 0.0, -0.5], [-0.2, 0.5, 0.0]])

    def orb(sdisp):
        c = c0 + sdisp * gen @ c0
        return Orbitals(energies=np.zeros(3), coefficients=c, overlap=s,
                        occupations=np.array([2.0, 0, 0]))

    res = nro_response(orb(0.0), orb(delta), orb(-delta), delta)
    m_exact = c0.T @ s @ (gen @ c0)
    lam_exact = np.linalg.svd(m_exact, compute_uv=False)
    np.testing.assert_allclose(res.lambda_singular, lam_exact, atol=1e-9)
