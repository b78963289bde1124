"""LIVE parity wave 50: the torch SQM1 core executed end to end, plus
the SQM2 basis/overlap layer — side by side with our on-device SQM
(calculators/sqm.py).

Conventions learned by execution (ref: SQM/sqm1/sqm1_core.py,
SQM/sqm2/sqm2_basis.py + sqm2_core.py):

  * SQM1Calculator's DEFAULT CONSTRUCTOR IS BROKEN: params defaults to
    None (:388) and __init__ dereferences params.element_params at :422
    — AttributeError unless the caller passes SQM1Parameters()
    explicitly (pinned; Calculator/sqm1_calculation_tools.py does).
  * Energies are ATOMIZATION-REFERENCED: a single atom is exactly 0 Ha
    (matches our e_ref subtraction, calculators/sqm.py:1040).
  * THE SQM1 H2 SURFACE HAS NO PHYSICAL MINIMUM: from 1.0 Angstrom the
    energy decreases MONOTONICALLY toward short range and plunges into
    a spurious fused-atom well around 0.2 Angstrom (measured: E(0.74 A)
    = -0.061, E(0.5) = -0.34, E(0.3) = -1.95, E(0.2) = -10.9 Ha) before
    the wall finally appears near 0.1 A (+3.2 Ha). Any H2 optimization
    under SQM1 collapses to a nonphysical geometry — our SQM's
    repulsion is calibrated to put the H2 minimum at the experimental
    r_e = 1.40 Bohr (pinned as a discrete interior minimum below).
  * SQM1 exposes a differentiable torch graph (the returned energy
    carries grad_fn), like SQM2.
  * The SQM2 BasisSet/EHT overlap matrix (sqm2_core.get_overlap_matrix)
    is a STATEFUL ACCESSOR — it returns None (printing a warning) until
    an energy evaluation populates the EHT matrices. Once computed, it
    is symmetric with UNIT diagonal and positive definite, sized per
    element (8 functions for water: O gets 4, each H gets 2). Our
    `_overlap_full` uses a FIXED per-atom orbital layout (4 = [s,p]):
    heavy-atom diagonals are 1, and the H p padding functions carry a
    self-overlap of ~0.9345 (inert — no electrons are assigned to
    them); both matrices are PD (pinned on both sides).
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")

ANG2BOHR = 1.8897261246257704
WATER_ANG = np.array([[0.0, 0.0, 0.1173],
                      [0.0, 0.7572, -0.4692],
                      [0.0, -0.7572, -0.4692]])


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    import importlib

    return importlib.import_module(name)


def _quiet(fn, *a, **k):
    with contextlib.redirect_stdout(io.StringIO()):
        return fn(*a, **k)


def _sqm1_energy(z, pos_ang, mod, params):
    with contextlib.redirect_stdout(io.StringIO()):
        calc = mod.SQM1Calculator(np.asarray(z), np.asarray(pos_ang),
                                  params=params)
        e = calc.calculate_total_energy()
    return e


def test_sqm1_live_default_params_constructor_crashes():
    mod = _ref_module("multioptpy.SQM.sqm1.sqm1_core")
    with pytest.raises(AttributeError):
        _quiet(mod.SQM1Calculator, np.array([1, 1]),
               np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.74]]))


def test_sqm1_live_atomization_reference_and_differentiability():
    mod = _ref_module("multioptpy.SQM.sqm1.sqm1_core")
    p = mod.SQM1Parameters()
    e_atom = _sqm1_energy([8], [[0.0, 0.0, 0.0]], mod, p)
    assert float(e_atom.detach()) == pytest.approx(0.0, abs=1e-10)
    e_w = _sqm1_energy([8, 1, 1], WATER_ANG, mod, p)
    assert np.isfinite(float(e_w.detach()))
    assert e_w.grad_fn is not None             # differentiable graph


def test_sqm1_live_h2_collapses_vs_our_calibrated_minimum():
    mod = _ref_module("multioptpy.SQM.sqm1.sqm1_core")
    p = mod.SQM1Parameters()

    def e_h2(r_ang):
        return float(_sqm1_energy(
            [1, 1], [[0.0, 0.0, 0.0], [0.0, 0.0, r_ang]], mod,
            p).detach())

    rs = [0.3, 0.4, 0.5, 0.74, 1.0]
    es = [e_h2(r) for r in rs]
    # monotonically DOWNHILL toward collapse — no interior minimum
    for a, b in zip(es, es[1:]):
        assert a < b, (rs, es)
    assert e_h2(0.2) < -10.0                   # the spurious deep well
    assert e_h2(0.74) > -0.1                   # experimental r_e region

    # ours: a genuine interior minimum at r_e(H2) = 1.40 Bohr
    from multioptpy_tpu.calculators.sqm import SQM
    import jax.numpy as jnp
    calc = SQM()
    z = np.array([1, 1])

    def e_ours(r_bohr):
        c = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r_bohr]],
                        jnp.float64)
        return float(calc.energy(c, z))

    e_short, e_min, e_long = e_ours(1.1), e_ours(1.4), e_ours(1.8)
    assert e_min < e_short and e_min < e_long


def test_sqm2_live_overlap_structure_matches_ours():
    core = _ref_module("multioptpy.SQM.sqm2.sqm2_core")
    calc = _quiet(core.SQM2Calculator, xyz=WATER_ANG,
                  element_list=np.array([8, 1, 1]), charge=0, spin=0)
    # the getter returns None (with a printed warning) until an energy
    # evaluation has populated the EHT matrices — a stateful accessor
    assert _quiet(calc.get_overlap_matrix) is None
    _quiet(calc.total_energy, WATER_ANG)
    s = calc.get_overlap_matrix()
    s = s.detach().numpy() if hasattr(s, "detach") else np.asarray(s)
    assert s.shape[0] == s.shape[1]
    np.testing.assert_allclose(s, s.T, atol=1e-10)
    np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-8)
    assert np.linalg.eigvalsh(s).min() > 0.0

    # ours: same structural contract on the same molecule
    from multioptpy_tpu.calculators.sqm import (_basis_params,
                                               _overlap_full)
    import jax.numpy as jnp
    z = np.array([8, 1, 1])
    bp = _basis_params(z)
    blocks = np.asarray(_overlap_full(
        jnp.asarray(WATER_ANG * ANG2BOHR, jnp.float64), bp, 4))
    n = 3
    s_ours = np.transpose(blocks, (0, 2, 1, 3)).reshape(4 * n, 4 * n)
    np.testing.assert_allclose(s_ours, s_ours.T, atol=1e-10)
    d = np.diag(s_ours)
    # O block (first 4) unit diagonal; H s unit; H p padding ~0.9345
    np.testing.assert_allclose(d[:4], 1.0, atol=1e-5)
    np.testing.assert_allclose(d[[4, 8]], 1.0, atol=1e-5)
    assert np.all((d > 0.9) & (d < 1.0 + 1e-5))
    assert np.linalg.eigvalsh(s_ours).min() > 0.0
