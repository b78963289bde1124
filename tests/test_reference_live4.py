"""LIVE parity vs the reference, wave 4: the analytic test-potential
backends (LJ / EMT / Tersoff) executed side by side with ours.

These pin formula-level parity on shared parameters AND document, with
exact reproductions, where the reference's own implementations deviate
from the literature they cite:

  * LJ (ref: Calculator/lj_calculation_tools.py:13-110): identical
    formula (Lorentz-Berthelot UFF 12-6). With the same Ar parameters
    injected, energy+gradient match to machine precision. Divergence
    pinned: the reference hardcodes Ar x_i=3.817/D_i=0.237 while the UFF
    paper it cites (Rappe 1992, Table 1) gives 3.868/0.185 — our table
    ships the published values.
  * EMT (ref: emt_calculation_tools.py:14-264 — ASE's EMT): Cu2 energy
    matches to 1e-15 after sharing the table-wide cutoff convention.
    Reference bugs pinned exactly: (a) its analytic force disagrees with
    the finite difference of its OWN energy (our autodiff matches the FD
    to 1e-9); (b) with full neighbor lists its atomic-sphere pair energy
    is double-counted and scalar-misdistributed
    (emt_calculation_tools.py:253-255: `energies[a2] += 0.5*np.sum(eo)`
    adds a scalar to every neighbor) — the exact discrepancy is
    reconstructed from the reference's own _calc_dsigma2 and added to our
    energy to reproduce its Cu4 number to 1e-12.
  * Tersoff (ref: tersoff_calculation_tools.py:16-460): identical
    formula for pair + bond-order terms. Divergence pinned: the
    reference's unit conversion divides the INVERSE-length parameters
    lambda/mu [1/A] by bohr2angstroms (:125-126) — the conversion for
    lengths, applied to inverse lengths — so its exponentials decay
    ANGSTROM2BOHR^2 = 3.57x too fast relative to its (correctly
    converted) cutoffs, and any physically bonded Si-Si distance in real
    Bohr evaluates to ~zero. Compensating by feeding it coordinates
    numerically equal to r[A] * 0.5292 aligns its exponentials with the
    published form: a Si dimer and an equilateral Si3 then match ours to
    1e-12 (fc = 1 on both sides there). Other pinned divergences: ref Si
    R=2.7/D=0.3 vs the published (R+S)/2=2.85, (S-R)/2=0.15 we use, and
    ref passes lambda1 where Tersoff-89 has lambda3=0 (:377).
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


# ==========================================================================
# Lennard-Jones (lj_calculation_tools.py)
# ==========================================================================

def test_lj_formula_parity_with_shared_parameters():
    ljm = _ref_module("multioptpy.Calculator.lj_calculation_tools")
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.periodic import UFF_VDW_EPS_KCAL, UFF_VDW_R_ANG

    core = ljm.LennardJonesCore()
    # inject OUR published-UFF Ar parameters into the reference instance so
    # the comparison isolates the formula (instance attr; class untouched)
    core.UFF_PARAMETERS = {**ljm.LennardJonesCore.UFF_PARAMETERS,
                           "Ar": {"x_i": float(UFF_VDW_R_ANG[18]),
                                  "D_i": float(UFF_VDW_EPS_KCAL[18])}}
    core._param_cache = {}

    rng = np.random.default_rng(1)
    base = np.array([[0, 0, 0], [7.2, 0, 0], [0, 7.4, 0], [0, 0, 7.0],
                     [7.1, 7.3, 7.2]], float)
    coords = base + 0.2 * rng.standard_normal((5, 3))
    res = core.calculate_energy_and_gradient(coords.copy(), ["Ar"] * 5)

    e, g = LennardJones().energy_and_gradient(jnp.asarray(coords),
                                              jnp.asarray([18] * 5))
    np.testing.assert_allclose(float(e), res["energy"], rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g), res["gradient"], atol=1e-13)


def test_lj_reference_table_diverges_from_uff_paper():
    """The reference's hardcoded noble-gas table is NOT the UFF table it
    cites (lj_calculation_tools.py:20-27 vs Rappe 1992 Table 1); ours is."""
    ljm = _ref_module("multioptpy.Calculator.lj_calculation_tools")
    from multioptpy_tpu.periodic import UFF_VDW_EPS_KCAL, UFF_VDW_R_ANG

    ref_ar = ljm.LennardJonesCore.UFF_PARAMETERS["Ar"]
    assert ref_ar == {"x_i": 3.817, "D_i": 0.237}      # what it ships
    assert float(UFF_VDW_R_ANG[18]) == pytest.approx(3.868)   # UFF paper
    assert float(UFF_VDW_EPS_KCAL[18]) == pytest.approx(0.185)


# ==========================================================================
# EMT (emt_calculation_tools.py — ASE's EMT)
# ==========================================================================

def _ref_emt_core():
    return _ref_module(
        "multioptpy.Calculator.emt_calculation_tools").EMTCore()


def test_emt_dimer_energy_exact():
    from multioptpy_tpu.calculators.emt import EMT

    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 4.8]])
    with contextlib.redirect_stdout(io.StringIO()):
        res = _ref_emt_core().calculate_energy_and_gradient(
            coords.copy(), ["Cu"] * 2)
    e = float(EMT().energy(jnp.asarray(coords), jnp.asarray([29, 29])))
    np.testing.assert_allclose(e, res["energy"], rtol=1e-14)


def test_emt_reference_analytic_force_is_wrong_ours_is_the_derivative():
    """Pin the reference's force bug: its analytic gradient disagrees with
    the central difference of its OWN energy, while our autodiff gradient
    IS that derivative (the dimer energies coincide exactly, so the FD of
    the reference energy is also the FD of ours)."""
    from multioptpy_tpu.calculators.emt import EMT

    core = _ref_emt_core()
    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 4.8]])
    eps = 1e-5
    with contextlib.redirect_stdout(io.StringIO()):
        res = core.calculate_energy_and_gradient(coords.copy(), ["Cu"] * 2)
        cp, cm = coords.copy(), coords.copy()
        cp[1, 2] += eps
        cm[1, 2] -= eps
        fd = (core.calculate_energy_and_gradient(cp, ["Cu"] * 2)["energy"] -
              core.calculate_energy_and_gradient(cm, ["Cu"] * 2)["energy"]
              ) / (2 * eps)

    _, g = EMT().energy_and_gradient(jnp.asarray(coords),
                                     jnp.asarray([29, 29]))
    ours = float(g[1, 2])
    np.testing.assert_allclose(ours, fd, atol=1e-9)      # ours = true dE/dx
    assert abs(res["gradient"][1, 2] - fd) > 0.1         # ref's is not


def test_emt_cu4_discrepancy_is_exactly_the_pair_double_count():
    """Reconstruct the reference's Cu4 energy from OURS plus the pair-term
    accounting error, using the reference's own _calc_theta/_calc_dsigma2:
    with full neighbor lists each ordered pair adds 0.5*sum(es) to a1 and
    the SCALAR 0.5*sum(eo) to every a2 (emt_calculation_tools.py:253-255),
    where the correct per-atom term is sum(es) once."""
    emt_mod = _ref_module("multioptpy.Calculator.emt_calculation_tools")
    from multioptpy_tpu.calculators.emt import EMT

    coords_bohr = np.array([[0, 0, 0], [4.6, 0, 0], [0, 4.7, 0],
                            [0, 0, 4.8]], float)
    syms = ["Cu"] * 4
    with contextlib.redirect_stdout(io.StringIO()):
        res = _ref_emt_core().calculate_energy_and_gradient(
            coords_bohr.copy(), syms)

    ours = float(EMT().energy(jnp.asarray(coords_bohr),
                              jnp.asarray([29] * 4)))

    # replay the reference's own pair bookkeeping to get the discrepancy
    ref = emt_mod.EMT(syms)
    pos = coords_bohr * ref.BOHR
    extra_ev = 0.0
    for a1 in range(4):
        diffs = pos - pos[a1]
        dists = np.linalg.norm(diffs, axis=1)
        nbrs = np.where((dists > 1e-9) & (dists < ref.rc_list))[0]
        r = dists[nbrs]
        w, _ = ref._calc_theta(r)
        es, eo = ref._calc_dsigma2(a1, nbrs, r, w)
        es = ref.par["neghalfv0overgamma2"][ref.ia2iz[a1]] * es
        eo = ref.par["neghalfv0overgamma2"][ref.ia2iz[nbrs]] * eo
        # reference adds: 0.5*sum(es) to a1, scalar 0.5*sum(eo) to each nbr
        ref_adds = 0.5 * np.sum(es) + len(nbrs) * 0.5 * np.sum(eo)
        correct = np.sum(es)             # what ours (and ASE) accounts
        extra_ev += ref_adds - correct
    expected_ref = ours + extra_ev * ref.EV_TO_HARTREE
    np.testing.assert_allclose(res["energy"], expected_ref, atol=1e-12)


# ==========================================================================
# Tersoff (tersoff_calculation_tools.py)
# ==========================================================================

def _ref_tersoff(coords_numeric, syms):
    tm = _ref_module("multioptpy.Calculator.tersoff_calculation_tools")
    with contextlib.redirect_stdout(io.StringIO()):
        return tm.TersoffCore().calculate_energy_and_gradient(
            coords_numeric.copy(), syms)


def test_tersoff_dimer_formula_parity_modulo_unit_bug():
    """The reference's lambda/mu are divided by bohr2angstroms at
    parameter fetch (tersoff_calculation_tools.py:125-126) — the length
    conversion, applied to inverse lengths. Its exponent lambda_ref * r
    therefore equals lambda[1/A] * (ANGSTROM2BOHR * r), so feeding it
    coordinates numerically equal to r[A] * bohr2angstroms aligns its
    exponentials with the published Tersoff we implement. A bonded Si2
    (r = 2.3 A; fc = 1 on both sides) then matches to machine
    precision."""
    from multioptpy_tpu.calculators.tersoff import Tersoff
    from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

    r_ang = 2.3
    coords_ang = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r_ang]])
    res = _ref_tersoff(coords_ang * BOHR2ANGSTROM, ["Si", "Si"])

    e = float(Tersoff().energy(jnp.asarray(coords_ang * ANGSTROM2BOHR),
                               jnp.asarray([14, 14])))
    assert e < -0.05                       # a bonded dimer, not cutoff noise
    np.testing.assert_allclose(e, res["energy"], rtol=1e-12)

    # the practical symptom: fed the same physical geometry in ACTUAL Bohr
    # (what its signature asks for), the reference's 3.57x-too-fast
    # exponentials evaluate the bonded dimer to ~nothing
    res_bohr = _ref_tersoff(coords_ang * ANGSTROM2BOHR, ["Si", "Si"])
    assert abs(res_bohr["energy"]) < 1e-3


def test_tersoff_equilateral_trimer_parity():
    """Equilateral Si3 exercises g(cos) and the bond order; r_ij == r_ik
    neutralizes both the reference's lambda3:=lambda1 substitution (:377;
    Tersoff-89 has lambda3 = 0, which we use) and any exp-term difference."""
    from multioptpy_tpu.calculators.tersoff import Tersoff
    from multioptpy_tpu.units import ANGSTROM2BOHR

    from multioptpy_tpu.units import BOHR2ANGSTROM

    a = 2.2
    coords_ang = np.array([[0.0, 0.0, 0.0], [a, 0.0, 0.0],
                           [0.5 * a, np.sqrt(3.0) / 2.0 * a, 0.0]])
    res = _ref_tersoff(coords_ang * BOHR2ANGSTROM, ["Si"] * 3)
    e = float(Tersoff().energy(jnp.asarray(coords_ang * ANGSTROM2BOHR),
                               jnp.asarray([14] * 3)))
    np.testing.assert_allclose(e, res["energy"], rtol=1e-10)
