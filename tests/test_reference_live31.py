"""LIVE parity wave 31: ADDF scaled-hypersphere machinery — the
reference's ADDFlikeMethod coordinate transforms, SHS angles, and IOE
illumination executed side by side with our drivers/addf.py scaling.

Conventions learned by execution (ref: OtherMethod/addf.py):

  * The SQ frames are built from eigenvector ROWS: SQaxes (:121) sets
    SQ[:, i] = eigVlist[i] * sqrt|lam_i| where eigVlist[i] is the i-th
    ROW of numpy's column-eigenvector matrix — executed: SQ equals
    V.T diag(sqrt lam) exactly (0.0) and differs from V diag(sqrt lam)
    by O(1). detect_add (:662) passes the raw eigh matrix, so each
    eigenvalue is paired with the TRANSPOSED frame direction, not its
    eigenvector. calctheta/SQaxes_inv use the same rows, so the system
    is internally consistent (SQ_inv SQ = I to 1e-15, theta round trip
    exact, |q|^2 = 2A exact) — but geometrically scrambled.
  * The scaling direction is INVERTED vs the cited SHS papers
    (Ohno-Maeda CPL 384 (2004) 277): x = SQ q MULTIPLIES by
    sqrt(lam), so even in the correct frame the sphere |q|^2 = 2A
    would have harmonic energy 1/2 sum lam_i^2 q_i^2, not A. Executed
    on a synthetic 4-mode spectrum (lam 1.0..10.5, A = 0.01): the
    sphere points seeded along the true eigenvectors have harmonic
    energies 0.0194..0.465 — a 23x spread — while calc_onHS (:180)
    subtracts IOEsphereA from func(x) as if the sphere were the
    harmonic isoenergy surface. Ours maps x = x0 + V (q / sqrt(lam))
    (drivers/addf.py:83), the paper's scaling: every point of |q|^2 =
    2A has harmonic energy exactly A (pinned executed).
  * angle_SHS (:165) is the angle between SQ_inv-mapped vectors —
    pinned against the explicit q-space arccos.
  * IOE illumination (:207): cos^3-damped within 90 degrees of an
    existing ADD, zero beyond; IOE_total (:193) SUBTRACTS illumination
    from neighbors, skipping (executed) the current ADD itself,
    already-optimized neighbors (ADDoptQ), sentinel ADD_IOE values
    outside (-1e6, 1e7], and neighbors with ADD > current_ADD.

Ref anchors: OtherMethod/addf.py:50-214 (transforms + IOE), :597-772
(detect_add); ours: drivers/addf.py:66-90 (scaled coords).
"""

import os
import sys
import types

import numpy as np
import pytest

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


class _Cfg:
    addf_step_num = 5
    nadd = 2
    addf_step_size = 0.1


def _method():
    addf_mod = _ref_module("multioptpy.OtherMethod.addf")
    return addf_mod.ADDFlikeMethod(_Cfg())


def _spectrum():
    rng = np.random.default_rng(31)
    h = rng.normal(size=(4, 4))
    h = h @ h.T + np.eye(4)
    lam, v = np.linalg.eigh(h)
    return h, lam, v


def test_addf_sq_frame_is_transposed_live():
    m = _method()
    h, lam, v = _spectrum()

    sq = m.SQaxes(lam, v, 4)
    # rows, not columns: SQ = V.T diag(sqrt lam) exactly
    assert np.abs(sq - v.T @ np.diag(np.sqrt(lam))).max() < 1e-14
    assert np.abs(sq - v @ np.diag(np.sqrt(lam))).max() > 0.1

    sq_inv = m.SQaxes_inv(lam, v, 4)
    assert np.abs(sq_inv @ sq - np.eye(4)).max() < 1e-12


def test_addf_theta_roundtrip_live():
    m = _method()
    h, lam, v = _spectrum()
    sq = m.SQaxes(lam, v, 4)

    a_sphere = 0.01
    th = m.calctheta(v[:, 0], v, lam)
    ss = m.SuperSphere_cartesian(a_sphere, th, sq, 4)
    th2 = m.calctheta(ss, v, lam)
    assert np.abs(np.asarray(th) - np.asarray(th2)).max() < 1e-12
    q = m.SQaxes_inv(lam, v, 4) @ ss
    assert float(q @ q) == pytest.approx(2 * a_sphere, rel=1e-12)


def test_addf_sphere_is_not_isoenergy_live():
    """The reference sphere's harmonic energy is mode-dependent (inverted
    scaling x transposed frame); ours is the exact isoenergy surface."""
    m = _method()
    h, lam, v = _spectrum()
    sq = m.SQaxes(lam, v, 4)

    a_sphere = 0.01
    e_harm = []
    for i in range(4):
        th = m.calctheta(v[:, i], v, lam)
        x = m.SuperSphere_cartesian(a_sphere, th, sq, 4)
        e_harm.append(0.5 * float(x @ h @ x))
    # executed: a >20x spread across modes at fixed "sphere energy" A
    assert max(e_harm) / min(e_harm) > 20
    assert max(e_harm) > 40 * a_sphere

    # ours: x = V (q / sqrt(lam)) makes every |q|^2 = 2A point carry
    # harmonic energy exactly A (drivers/addf.py to_cart convention)
    rng = np.random.default_rng(311)
    for _ in range(5):
        q = rng.normal(size=4)
        q *= np.sqrt(2 * a_sphere) / np.linalg.norm(q)
        x_ours = v @ (q / np.sqrt(lam))
        assert 0.5 * float(x_ours @ h @ x_ours) == pytest.approx(
            a_sphere, rel=1e-12)


def test_addf_angle_shs_live():
    m = _method()
    h, lam, v = _spectrum()
    sq_inv = m.SQaxes_inv(lam, v, 4)

    rng = np.random.default_rng(312)
    v1, v2 = rng.normal(size=4), rng.normal(size=4)
    got = m.angle_SHS(v1, v2, sq_inv)
    q1, q2 = sq_inv @ v1, sq_inv @ v2
    expect = np.arccos(np.clip(
        q1 @ q2 / (np.linalg.norm(q1) * np.linalg.norm(q2)), -1, 1))
    assert got == pytest.approx(expect, abs=1e-12)
    # degenerate guard: zero vector -> 0.0
    assert m.angle(np.zeros(4), v2) == 0.0


def test_addf_ioe_cos3_and_gating_live():
    m = _method()
    h, lam, v = _spectrum()
    m.SQ = m.SQaxes(lam, v, 4)
    m.SQ_inv = m.SQaxes_inv(lam, v, 4)
    m.dim = 4

    def addth(idnum, ndir, add=0.0, add_ioe=1.0, opt=False):
        t = type("ADDthetaClass", (), {})()
        t.IDnum = idnum
        t.nADD = ndir
        t.ADD = add
        t.ADD_IOE = add_ioe
        t.ADDoptQ = opt
        return t

    # direction pairs with a known SHS angle: use SQ columns (q = e_i)
    d0, d1 = m.SQ[:, 0], m.SQ[:, 1]

    # IOE formula: cos^3 damping inside 90 deg, zero outside
    nb = addth(1, d0, add_ioe=2.0)
    assert m.IOE(d0, nb) == pytest.approx(2.0)           # 0 deg: full
    assert m.IOE(d1, nb) == pytest.approx(0.0, abs=1e-15)  # 90 deg: zero
    mid = d0 + d1  # 45 degrees in q-space
    assert m.IOE(mid, nb) == pytest.approx(2.0 * np.cos(np.pi / 4) ** 3)

    # IOE_total gating, executed: self skipped, ADDoptQ skipped,
    # sentinel ADD_IOE skipped, higher-ADD neighbors skipped
    m.current_id = 0
    m.current_ADD = 1.0
    m.ADDths = [
        addth(0, d0, add=0.5, add_ioe=5.0),          # self -> skipped
        addth(1, d0, add=0.5, add_ioe=2.0),          # counts (-2.0)
        addth(2, d0, add=0.5, add_ioe=3.0, opt=True),  # optimized -> skip
        addth(3, d0, add=0.5, add_ioe=-2e6),         # sentinel -> skip
        addth(4, d0, add=1.5, add_ioe=1.0),          # ADD > current -> skip
    ]
    assert m.IOE_total(d0) == pytest.approx(-2.0)
