"""LIVE parity wave 33: KrylovDIIS — the reference's Krylov-subspace +
geometry-DIIS step enhancement executed, pinned against numpy replicas
and our steppers/diis.py kdiis_step conventions.

Conventions learned by execution (ref: Optimizer/kdiis.py):

  * run() passes the original step through verbatim for the first
    diis_start_iter = 2 iterations (:521-556) — history building only.
  * DEFECT (Krylov collapse): the "Hessian-vector product" for basis
    expansion (:186-200) is Hv = g_diff * (v.v / x_diff.v) — the SAME
    gradient-difference direction regardless of v. The second expansion
    therefore orthogonalizes a vector already in the basis, hits the
    1e-10 tolerance, prints "Krylov basis saturated", and the basis is
    permanently span{g_hat, g_diff_orth}: dimension 2, never the
    configured krylov_dimension = 5 (pinned executed). The projected
    "Newton" step uses at most a rank-2 subspace.
  * _solve_diis_system (:321-387): standard bordered DIIS on raw
    gradient error vectors with +1e-8 diagonal regularization —
    coefficient vector pinned against an explicit bordered solve; a
    solve whose |c|_max > 10 raises internally and falls back to
    (latest geometry, coeffs [0..0, 1], success=False).
  * _blend_steps (:389-519): weight algebra pinned executed —
    krylov_weight = clip(align, 0.3, 0.7) when align > 0.1;
    original -= 0.7 * krylov_weight; diis_weight = 0.9 * clip(align,
    0.2, 0.8) when align > 0, with the OTHER weights rescaled by
    (1 - diis_weight)/total_other; weights renormalized to 1; each
    non-original step magnitude-clamped into [0.5, 2.0] x |original|
    before weighting; the blend capped at 3 x |original|. Ours
    (steppers/diis.py kdiis_step:169) reproduces this blend weighting
    branchlessly with a masked-MGS basis — same formula family, jitted.

Ref anchors: Optimizer/kdiis.py:15-56 (defaults), :129-240 (basis),
:275-387 (solves), :389-519 (blend), :521-624 (run);
ours: steppers/diis.py:164-260.
"""

import contextlib
import io
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


def _kdiis():
    mod = _ref_module("multioptpy.Optimizer.kdiis")
    return mod.KrylovDIIS()


def test_kdiis_early_passthrough_live():
    k = _kdiis()
    rng = np.random.default_rng(33)
    g0 = rng.normal(size=(3, 3))
    x0 = rng.normal(size=(3, 3))
    step0 = rng.normal(size=(3, 3))
    with contextlib.redirect_stdout(io.StringIO()):
        out0 = k.run(x0, -1.0, g0, step0)
        out1 = k.run(x0 + 0.1, -1.1, g0 * 0.9, step0)
    assert out0 is step0 and out1 is step0  # verbatim passthrough
    assert k.iter == 2


def test_kdiis_krylov_basis_collapses_at_two_live():
    k = _kdiis()
    rng = np.random.default_rng(330)
    x0 = rng.normal(size=(3, 3))
    g0 = rng.normal(size=(3, 3))
    x1 = x0 + 0.05 * rng.normal(size=(3, 3))
    g1 = g0 + 0.3 * rng.normal(size=(3, 3))
    with contextlib.redirect_stdout(io.StringIO()):
        k._update_histories(x0, g0, -1.0)
        k._update_histories(x1, g1, -1.05)
        k.iter = 2  # past restart trigger arithmetic

    assert k.krylov_dimension == 5  # configured target
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ok = k._build_krylov_subspace(g1)
    assert ok is True
    # DEFECT: every expansion proposes the same g_diff direction, so the
    # basis saturates at dimension 2
    assert len(k.krylov_basis) == 2
    assert "saturated" in buf.getvalue()
    # basis content: normalized gradient + orthogonalized g_diff
    v0 = g1 / np.linalg.norm(g1)
    assert np.allclose(k.krylov_basis[0], v0, atol=1e-12)
    g_diff = (g1 - g0)
    w = g_diff - np.dot(v0.flatten(), g_diff.flatten()) * v0
    # (the executed Hv carries the v.v/x.v scale, but normalization
    # removes it)
    assert np.allclose(np.abs(k.krylov_basis[1]),
                       np.abs(w / np.linalg.norm(w)), atol=1e-10)


def test_kdiis_diis_system_bordered_solve_live():
    k = _kdiis()
    rng = np.random.default_rng(331)
    n = 3
    with contextlib.redirect_stdout(io.StringIO()):
        for i in range(n):
            x = rng.normal(size=(2, 3))
            g = rng.normal(size=(2, 3)) * (0.5 ** i)
            k._update_histories(x, g, -1.0 - 0.01 * i)
        geom, coeffs, ok = k._solve_diis_system()
    assert ok is True
    assert float(np.sum(coeffs)) == pytest.approx(1.0, abs=1e-10)

    # explicit bordered replica with the 1e-8 regularization
    errs = [e.flatten() for e in k.error_history]
    b = np.zeros((n + 1, n + 1))
    for i in range(n):
        for j in range(n):
            b[i, j] = errs[i] @ errs[j]
    b[:n, :n] += np.eye(n) * 1e-8
    b[n, :n] = b[:n, n] = 1.0
    rhs = np.zeros(n + 1)
    rhs[n] = 1.0
    expect = np.linalg.solve(b, rhs)[:n]
    assert np.allclose(coeffs, expect, atol=1e-10)
    geom_expect = sum(c * gm for c, gm in zip(expect, k.geom_history))
    assert np.allclose(geom, geom_expect, atol=1e-10)


def test_kdiis_diis_extreme_coefficients_fallback_live():
    k = _kdiis()
    rng = np.random.default_rng(332)
    base_err = rng.normal(size=(2, 3))
    with contextlib.redirect_stdout(io.StringIO()):
        # nearly PARALLEL error vectors with ~1% magnitude spread: the
        # sum-to-1 constraint forces O(100) cancelling coefficients ->
        # the |c|_max > 10 guard raises -> fallback path
        for scale in (1.0, 1.01, 0.99):
            x = rng.normal(size=(2, 3))
            k._update_histories(x, base_err * scale, -1.0)
        geom, coeffs, ok = k._solve_diis_system()
    assert ok is False
    assert np.allclose(geom, k.geom_history[-1])
    assert list(coeffs) == [0.0, 0.0, 1.0]


def test_kdiis_blend_weights_live():
    k = _kdiis()
    rng = np.random.default_rng(333)
    x_hist = rng.normal(size=(2, 3))
    with contextlib.redirect_stdout(io.StringIO()):
        k._update_histories(x_hist, rng.normal(size=(2, 3)), -1.0)

    gradient = np.zeros((2, 3))
    gradient[0, 0] = 1.0
    neg = -gradient.flatten()

    original = rng.normal(size=(2, 3)) * 0.1
    krylov = -gradient * 0.25            # align = 1.0 -> weight 0.7
    diis_geom = x_hist - gradient * 0.15  # step -g: align 1 -> 0.9*0.8

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = k._blend_steps(krylov.copy(), diis_geom.copy(),
                             original.copy(), gradient)

    # replica of the weight algebra
    w = {"original": 1.0, "krylov": 0.0, "diis": 0.0}
    k_align = float(krylov.flatten() @ neg) / np.linalg.norm(krylov)
    kw = min(0.7, max(0.3, k_align))
    w["krylov"] = kw
    w["original"] -= kw * 0.7
    dvec = (diis_geom - x_hist)
    d_align = float(dvec.flatten() @ neg) / np.linalg.norm(dvec)
    dw = 0.9 * min(0.8, max(0.2, d_align))
    w["diis"] = dw
    other = w["original"] + w["krylov"]
    f = (1.0 - dw) / other
    w["original"] *= f
    w["krylov"] *= f
    tot = sum(w.values())
    for key in w:
        w[key] /= tot

    def clamp(vec):
        on, vn = np.linalg.norm(original), np.linalg.norm(vec)
        if vn > 2 * on:
            return vec * (2 * on / vn)
        if vn < 0.5 * on:
            return vec * (0.5 * on / vn)
        return vec

    expect = (w["original"] * original + w["krylov"] * clamp(krylov)
              + w["diis"] * clamp(dvec))
    if np.linalg.norm(expect) > 3 * np.linalg.norm(original):
        expect *= 3 * np.linalg.norm(original) / np.linalg.norm(expect)
    assert np.allclose(out, expect, atol=1e-12)
    assert "Blend weights" in buf.getvalue()
