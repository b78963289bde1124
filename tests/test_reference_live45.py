"""LIVE parity wave 45: the torch SQM2's component stack — EEQ
electrostatics, repulsion, SRB, dispersion — executed piecewise and
mirrored, side by side with our SQM2.energy_terms breakdown
(calculators/sqm.py:857). Wave complements test_host_bridge_live.py
(which drives the reference's TOTAL gradient through our host bridge).

Conventions learned by execution (ref: SQM/sqm2/*.py):

  * THE LIVE COORDINATION NUMBER IS DOUBLE THE LEGACY ONE:
    get_cn_modified (sqm2_eeq.py:87-102) multiplies the erf-counting
    row sum by 2.0; get_cn_modified_legacy computes the same sum
    unscaled. The X vector therefore uses kCN sqrt(2 CN) — a sqrt(2)
    inflation relative to the published D4-EEQ CN (pinned: ratio
    2.0 to 1e-6; the residual is the vectorized path's eps-softened
    distances).
  * EEQ solves [A 1; 1 0][q; lam] = [kCN sqrt(CN) - chi; Q] with the
    erf-screened kernel erf(sqrt(g_i^2+g_j^2) r)/r and diagonal
    gamma_i + 2 alpha_i/sqrt(pi) (:34-63); E = q^T (1/2 A q - X)
    (:174-180). Charges conserve the total charge to 1e-14 and the
    autograd gradient equals the central difference of the energy
    (unlike ModelHessian/shortrange, whose derivative bugs wave 13
    pinned — the SQM2 flavor is self-consistent by construction).
  * Repulsion (sqm2_rep.py:19-44): Zeff_i Zeff_j / r exp(-sqrt(a_i a_j
    r^3)) over i<j (triu), positive at equilibrium water geometry.
  * SRB (sqm2_srb.py:21-48): k_srb exp(-eta (1+g dEN^2)
    (r - rcov(1 - c1 dEN - c2 dEN^2))^2) with k_srb = -0.013 — an
    ATTRACTIVE Gaussian well; homonuclear pairs keep dEN = 0 but still
    contribute (unlike our charged shortrange correction, wave 13).
  * Dispersion (sqm2_disp.py:27-48): D2-style C6 + C8 = 3 C6 sqrt(r4r2)
    with RATIONAL damping 1/(1 + 6 beta (vdw_i+vdw_j)/r) — not the
    published exponential Fermi damping; the diagonal is excluded by
    adding 1e10 to r, and the double-counted sum is halved.
  * SQM2Calculator.total_energy (sqm2_core.py:50-68) is exactly the sum
    of the five components (EHT + EEQ + rep + SRB + disp, pinned);
    every component gradient in total_gradient passes through
    torch.nan_to_num (:85-97) — non-finite forces are silently zeroed
    rather than raised.
  * Our SQM2.energy_terms exposes the same decomposition {eht, eeq,
    rep, disp, srb, charges} with the same sign structure on water
    (rep > 0, disp < 0, q_O < 0 < q_H, sum q = charge) — different
    parameterization by design (calculators/sqm.py:103-140 calibration
    notes), same physics layout.
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
WATER_BOHR = np.array([[0.0, 0.0, 0.1173],
                       [0.0, 0.7572, -0.4692],
                       [0.0, -0.7572, -0.4692]]) * ANG2BOHR
Z = np.array([8, 1, 1])
Z0 = Z - 1                                     # the reference's 0-indexing


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


def _params():
    return _ref_module("multioptpy.SQM.sqm2.sqm2_data").SQM2Parameters()


# ==========================================================================
# repulsion / SRB / dispersion mirrors
# ==========================================================================

def test_sqm2_repulsion_live_mirror():
    mod = _ref_module("multioptpy.SQM.sqm2.sqm2_rep")
    p = _params()
    eng = mod.RepulsionCalculator(Z0, p)
    got = float(eng.energy(WATER_BOHR))

    zeff = np.array([p.repZeff[i] for i in Z0])
    alph = np.array([p.repAlpha[i] for i in Z0])
    e = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            r = np.sqrt(np.sum((WATER_BOHR[i] - WATER_BOHR[j]) ** 2)
                        + 1e-12)
            e += zeff[i] * zeff[j] / r * np.exp(
                -np.sqrt(alph[i] * alph[j] * r ** 3))
    assert got == pytest.approx(e, rel=1e-12)
    assert got > 0.0

    # gradient is the exact autograd of the same expression
    _, g = eng.gradient(WATER_BOHR)
    g = g.detach().numpy().reshape(3, 3)
    h = 1e-6
    x = WATER_BOHR.copy()
    x[0, 2] += h
    ep = float(eng.energy(x))
    x[0, 2] -= 2 * h
    em = float(eng.energy(x))
    assert g[0, 2] == pytest.approx((ep - em) / (2 * h), abs=1e-7)


def test_sqm2_srb_live_mirror_attractive():
    mod = _ref_module("multioptpy.SQM.sqm2.sqm2_srb")
    p = _params()
    eng = mod.SRBCalculator(Z0, p)
    got = float(eng.energy(WATER_BOHR))
    assert p.k_srb == pytest.approx(-0.013)

    en = np.array([p.en_data_srb[i] for i in Z0])
    r0 = np.array([p.r0_data_srb[i] for i in Z0])
    e = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            r = np.sqrt(np.sum((WATER_BOHR[i] - WATER_BOHR[j]) ** 2)
                        + 1e-12)
            den = abs(en[i] - en[j])
            rcov = (r0[i] + r0[j]) * (1.0 - p.c_1_srb * den
                                      - p.c_2_srb * den * den)
            e += p.k_srb * np.exp(-p.eta_srb * (1 + p.g_scal_srb
                                                * den * den)
                                  * (r - rcov) ** 2)
    assert got == pytest.approx(e, rel=1e-12)
    assert got < 0.0                           # attractive well

    # homonuclear pair still contributes (dEN = 0 does not zero it) —
    # unlike our wave-13-pinned charged shortrange convention
    h2 = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.4]])
    eng_h2 = mod.SRBCalculator(np.array([0, 0]), p)
    assert float(eng_h2.energy(h2)) != 0.0


def test_sqm2_dispersion_live_mirror_rational_damping():
    mod = _ref_module("multioptpy.SQM.sqm2.sqm2_disp")
    p = _params()
    eng = mod.DispersionCalculator(Z0, p)
    got = float(eng.energy(WATER_BOHR))

    c6 = np.array([p.c6[i] for i in Z0])
    r4r2 = np.array([p.r4r2[i] for i in Z0])
    vdw = np.array([p.d2_vdw[i] for i in Z0])
    e = 0.0
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            r = np.linalg.norm(WATER_BOHR[i] - WATER_BOHR[j])
            c6ij = np.sqrt(c6[i] * c6[j])
            c8ij = 3.0 * c6ij * np.sqrt(r4r2[i] * r4r2[j])
            dsum = vdw[i] + vdw[j]
            d6 = 1.0 / (1.0 + 6.0 * (dsum / r) * p.beta_6)
            d8 = 1.0 / (1.0 + 6.0 * (dsum / r) * p.beta_8)
            e += -0.5 * (p.s6 * c6ij / r ** 6 * d6
                         + p.s8 * c8ij / r ** 8 * d8)
    assert got == pytest.approx(e, rel=1e-10)
    assert got < 0.0


# ==========================================================================
# EEQ
# ==========================================================================

def test_sqm2_eeq_live_cn_is_double_legacy():
    mod = _ref_module("multioptpy.SQM.sqm2.sqm2_eeq")
    ies = mod.IESEnergyCalculator(Z0, 0, _params())
    x = torch.tensor(WATER_BOHR, dtype=torch.float64)
    cn_live = ies.get_cn_modified(x).numpy().ravel()
    cn_leg = ies.get_cn_modified_legacy(x).numpy().ravel()
    np.testing.assert_allclose(cn_live / cn_leg, 2.0, rtol=1e-6)


def test_sqm2_eeq_live_solve_energy_and_gradient_consistency():
    mod = _ref_module("multioptpy.SQM.sqm2.sqm2_eeq")
    p = _params()
    ies = mod.IESEnergyCalculator(Z0, 0, p)
    q = ies.eeq_charge(WATER_BOHR).detach().numpy().ravel()
    # conservation + sign structure
    assert abs(q.sum()) < 1e-13
    assert q[0] < 0 < q[1]
    assert q[1] == pytest.approx(q[2], abs=1e-12)

    # energy = q^T (1/2 A q - X) with the mirrored kernel
    gam = np.array([p.eeqGam[i] for i in Z0])
    alp = np.array([p.eeqAlp[i] for i in Z0])
    kcn = np.array([p.eeqkCN[i] for i in Z0])
    chi = np.array([p.eeqChi[i] for i in Z0])
    eps = np.finfo(np.float64).eps ** 0.5
    n = 3
    a = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i == j:
                a[i, i] = gam[i] + 2.0 * alp[i] / np.sqrt(np.pi)
            else:
                r = np.sqrt(np.sum((WATER_BOHR[i] - WATER_BOHR[j]) ** 2)
                            + eps)
                gij = np.sqrt(gam[i] ** 2 + gam[j] ** 2)
                from scipy.special import erf
                a[i, j] = erf(gij * r) / r
    x_t = torch.tensor(WATER_BOHR, dtype=torch.float64)
    cn = mod.IESEnergyCalculator(Z0, 0, p).get_cn_modified(
        x_t).numpy().ravel()
    xv = kcn * np.sqrt(cn) - chi
    big = np.zeros((n + 1, n + 1))
    big[:n, :n] = a
    big[:n, n] = 1.0
    big[n, :n] = 1.0
    rhs = np.concatenate([xv, [0.0]])
    sol = np.linalg.solve(big, rhs)
    np.testing.assert_allclose(q, sol[:n], atol=1e-12)
    e_mirror = q @ (0.5 * a @ q - xv)
    assert float(ies.energy(WATER_BOHR)) == pytest.approx(e_mirror,
                                                          rel=1e-10)

    # autograd gradient == central difference (self-consistent EEQ)
    _, g = ies.gradient(WATER_BOHR)
    g = g.detach().numpy()
    h = 1e-6
    xx = WATER_BOHR.copy()
    xx[1, 1] += h
    ep = float(ies.energy(xx))
    xx[1, 1] -= 2 * h
    em = float(ies.energy(xx))
    assert g[1, 1] == pytest.approx((ep - em) / (2 * h), abs=1e-7)


# ==========================================================================
# totals vs our decomposition
# ==========================================================================

def test_sqm2_total_is_component_sum_and_our_terms_share_signs():
    core = _ref_module("multioptpy.SQM.sqm2.sqm2_core")
    xyz_ang = WATER_BOHR / ANG2BOHR
    calc = _quiet(core.SQM2Calculator, xyz=xyz_ang, element_list=Z,
                  charge=0, spin=0)
    e_tot = _quiet(calc.total_energy, xyz_ang)

    e_rep = float(calc.repulsion_calculator.energy(WATER_BOHR))
    e_srb = float(calc.srb_calculator.energy(WATER_BOHR))
    e_ies = float(calc.ies_calculator.energy(WATER_BOHR))
    e_disp = float(calc.dispersion_calculator.energy(WATER_BOHR))
    q = calc.ies_calculator.eeq_charge(WATER_BOHR).detach().numpy()
    cn = calc.ies_calculator.cn(WATER_BOHR).detach().numpy()
    e_eht = float(_quiet(calc.eht_calculator.energy, WATER_BOHR, q, cn))
    assert e_tot == pytest.approx(e_rep + e_srb + e_ies + e_disp + e_eht,
                                  rel=1e-12)

    # ours: same sign structure on the same molecule
    from multioptpy_tpu.calculators.sqm import SQM2
    import jax.numpy as jnp
    terms = SQM2().energy_terms(jnp.asarray(WATER_BOHR, jnp.float64),
                                Z)
    assert float(terms["rep"]) > 0.0
    assert float(terms["disp"]) < 0.0
    ours_q = np.asarray(terms["charges"])
    assert ours_q[0] < 0 < ours_q[1]
    assert abs(ours_q.sum()) < 1e-10
    assert np.isfinite(float(terms["eht"]))
