"""LIVE parity wave 46: the Newton quasi-Newton engine, CRSIRFO's
constrained null-space machinery, and the GeodesicStepper enhancement —
executed side by side with our steppers (rfo/first_order) and
constraints/project.py.

Conventions learned by execution (ref: Optimizer/newton.py, crsirfo.py,
geodesic_step.py):

  * Newton.normal (newton.py:94-145): the first call returns the
    steepest-descent move DELTA*B_g with DELTA=0.5 (no Hessian); every
    later call solves (H + dH_secant + H_bias) s = B_g and returns
    0.5 s — a PERMANENTLY half-damped Newton step. Like TRLBFGS (wave
    38), Prodigy and ABC_FIRE (41), it CRASHES on molecular (N,3)
    input from the second call: the secant pair reshape(len(geom), 1)
    needs pre-flattened (3N,1) columns (:104-105, pinned).
  * Newton.moment (:148-193, "m-quasi-Newton", arXiv:2307.13744): the
    momentum state MIXES QUANTITY TYPES — it is meant to be seeded with
    a displacement/gradient-difference at iter==1 (:156-158), but the
    Initialization return path skips the iter increment, so the seeding
    arrives one call late and the call-2 momenta are EMA-updated from
    ZERO with the ABSOLUTE geometry and gradient (beta*m + (1-beta)*x,
    :166-167): the call-2 secant pair is measured to be exactly
    ((1-beta) x_current, (1-beta) g_current) — a raw POSITION, not a
    displacement — so the m-BFGS Hessian update is translation-VARIANT:
    rigidly shifting the molecule changes the update (pinned by
    executing two shifted copies). Our steppers use displacement
    secants only.
  * CRSIRFO (crsirfo.py:15-43) builds the constraint null space by SVD
    of the normalized constraint-Jacobian transpose with threshold
    max(1e-5, s_max*1e-6); with no constraints object the basis is the
    identity; a FULLY constrained system returns a (3N,0) basis and
    run() answers a zero move vector immediately (:46-120, pinned with
    a stub constraints object). Our constraints/project.py projects
    the step instead of carrying a reduced basis.
  * GeodesicStepper.run (geodesic_step.py:375-432) uses BOND LENGTHS
    ONLY as the manifold coordinates (determine_bonds at 1.5x summed
    covalent radii): the incoming optimizer step is pushed through
    v0 = B@move (:421), so every component outside the bond-stretch
    subspace — rigid translations, rotations, pure bends — is
    ANNIHILATED before the geodesic integration (pinned: a rigid
    translation step returns ~0; water's 9-dim random step keeps only
    ~6% of its norm in the 2-bond manifold). A zero incoming step
    returns exactly zero; a geometry with no detected bonds returns
    the original step unchanged.
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

ANG2BOHR = 1.8897261246257704
WATER = np.array([[0.0, 0.0, 0.1173],
                  [0.0, 0.7572, -0.4692],
                  [0.0, -0.7572, -0.4692]]) * ANG2BOHR


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


# ==========================================================================
# Newton
# ==========================================================================

def test_newton_live_first_call_sd_then_half_damped_solve():
    mod = _ref_module("multioptpy.Optimizer.newton")
    upd = _ref_module("multioptpy.Optimizer.hessian_update")
    eng = mod.Newton(method="bfgs")
    d = 9
    rng = np.random.default_rng(70)
    h0 = np.eye(d)
    eng.set_hessian(h0.copy())
    eng.set_bias_hessian(np.zeros((d, d)))
    x0 = rng.standard_normal((d, 1))
    g0 = rng.standard_normal((d, 1))
    mv0 = _quiet(eng.run, x0, g0, None, None, 0.0, 0.0, None, None,
                 g0, None)
    np.testing.assert_allclose(mv0, 0.5 * g0, atol=0)   # SD first call

    x1 = x0 - mv0
    g1 = 0.7 * g0
    mv1 = _quiet(eng.run, x1, g1, g0, x0, 0.0, 0.0, None, None,
                 g1, g0)
    dh = upd.ModelHessianUpdate().BFGS_hessian_update(
        h0, (x1 - x0).reshape(d, 1), (g1 - g0).reshape(d, 1))
    want = 0.5 * np.linalg.solve(h0 + dh, g1)
    np.testing.assert_allclose(mv1, want, atol=1e-12)


def test_newton_live_crashes_on_molecular_geometry():
    mod = _ref_module("multioptpy.Optimizer.newton")
    eng = mod.Newton(method="bfgs")
    n = 3
    eng.set_hessian(np.eye(3 * n))
    eng.set_bias_hessian(np.zeros((3 * n, 3 * n)))
    rng = np.random.default_rng(71)
    x = rng.standard_normal((n, 3))
    g = rng.standard_normal((n, 3))
    _quiet(eng.run, x, g, None, None, 0.0, 0.0, None, None, g, None)
    with pytest.raises(ValueError):            # reshape(N, 1) on 3N data
        _quiet(eng.run, x - 0.1 * g, 0.5 * g, g, x, 0.0, 0.0, None,
               None, 0.5 * g, g)


def test_newton_live_moment_secant_is_translation_variant():
    mod = _ref_module("multioptpy.Optimizer.newton")

    def second_hessian(shift):
        eng = mod.Newton(method="mBFGS")
        d = 6
        eng.set_hessian(np.eye(d))
        eng.set_bias_hessian(np.zeros((d, d)))
        rng = np.random.default_rng(72)
        x0 = rng.standard_normal((d, 1)) + shift
        g0 = rng.standard_normal((d, 1))
        _quiet(eng.run, x0, g0, None, None, 0.0, 0.0, None, None,
               g0, None)
        x1 = x0 - 0.05 * g0
        g1 = 0.8 * g0
        _quiet(eng.run, x1, g1, g0, x0, 0.0, 0.0, None, None, g1, g0)
        return eng.hessian.copy()

    h_a = second_hessian(0.0)
    h_b = second_hessian(50.0)                 # rigid shift of the system
    # the gradients are identical; only absolute positions moved — yet
    # the updated Hessian differs (momentum mixes absolute coordinates)
    assert not np.allclose(h_a, h_b, atol=1e-8)

    # algebraic collapse of the call-2 pair: dm = (1-beta) * pre values
    eng = mod.Newton(method="mBFGS")
    d = 6
    eng.set_hessian(np.eye(d))
    eng.set_bias_hessian(np.zeros((d, d)))
    rng = np.random.default_rng(73)
    x0 = rng.standard_normal((d, 1))
    g0 = rng.standard_normal((d, 1))
    _quiet(eng.run, x0, g0, None, None, 0.0, 0.0, None, None, g0, None)
    seen = {}
    orig = eng.hessian_update

    def spy(disp, dgrad):
        seen["disp"] = disp.copy()
        seen["dgrad"] = dgrad.copy()
        return orig(disp, dgrad)

    eng.hessian_update = spy
    x1 = x0 - 0.05 * g0
    g1 = 0.8 * g0
    _quiet(eng.run, x1, g1, g0, x0, 0.0, 0.0, None, None, g1, g0)
    beta = 0.5
    # the pair is the CURRENT absolute position/gradient, halved
    np.testing.assert_allclose(seen["disp"], (1 - beta) * x1, atol=1e-13)
    np.testing.assert_allclose(seen["dgrad"], (1 - beta) * g1,
                               atol=1e-13)


# ==========================================================================
# CRSIRFO null space
# ==========================================================================

class _StubConstraints:
    """Minimal object satisfying CRSIRFO's constraint interface."""

    def __init__(self, vectors):
        self._vectors = vectors

    def _get_all_constraint_vectors(self, geom):
        return self._vectors

    def adjust_init_coord(self, geom):
        return geom


def test_crsirfo_live_null_space_basis():
    mod = _ref_module("multioptpy.Optimizer.crsirfo")
    n = 2
    d = 3 * n
    rng = np.random.default_rng(74)
    geom = rng.standard_normal((n, 3))

    # no constraints -> identity basis
    eng = _quiet(mod.CRSIRFO, constraints=None)
    u = eng._get_null_space_basis(geom)
    np.testing.assert_allclose(u, np.eye(d), atol=0)

    # one bond-like constraint -> 5-dim null space orthogonal to it
    c = rng.standard_normal((1, d))
    eng2 = _quiet(mod.CRSIRFO, constraints=_StubConstraints(c))
    u2 = eng2._get_null_space_basis(geom)
    assert u2.shape == (d, d - 1)
    np.testing.assert_allclose(u2.T @ (c.ravel() / np.linalg.norm(c)),
                               0.0, atol=1e-12)
    np.testing.assert_allclose(u2.T @ u2, np.eye(d - 1), atol=1e-12)

    # fully constrained -> empty basis, run() returns the zero move
    full = np.eye(d)
    eng3 = _quiet(mod.CRSIRFO, constraints=_StubConstraints(full))
    eng3.set_hessian(np.eye(d))
    u3 = eng3._get_null_space_basis(geom)
    assert u3.shape == (d, 0)
    mv = _quiet(eng3.run, geom.reshape(-1, 1),
                rng.standard_normal((d, 1)))
    np.testing.assert_allclose(mv, 0.0, atol=0)


def test_crsirfo_live_basis_projector_is_complement_of_constraint():
    """The SVD null-space route lands on the same projector our
    constraints/project.py applies directly: U U^T = I - c_hat c_hat^T
    (ours realizes it matrix-free in Constraints._projector_apply)."""
    mod = _ref_module("multioptpy.Optimizer.crsirfo")
    rng = np.random.default_rng(75)
    n = 3
    d = 3 * n
    geom = rng.standard_normal((n, 3))
    c = rng.standard_normal((1, d))
    eng = _quiet(mod.CRSIRFO, constraints=_StubConstraints(c))
    u = eng._get_null_space_basis(geom)
    p_ref = u @ u.T                            # rank d-1 projector
    c_hat = c.ravel() / np.linalg.norm(c)
    np.testing.assert_allclose(p_ref, np.eye(d) - np.outer(c_hat, c_hat),
                               atol=1e-12)


# ==========================================================================
# GeodesicStepper
# ==========================================================================

def test_geodesic_live_bond_manifold_annihilates_translations():
    mod = _ref_module("multioptpy.Optimizer.geodesic_step")
    eng = mod.GeodesicStepper(["O", "H", "H"])
    q, pairs, _ = eng.calculate_internal_coordinates(WATER)
    assert pairs == [(0, 1), (0, 2)]           # O-H bonds only, no H..H
    np.testing.assert_allclose(q, 1.80993356, rtol=1e-6)

    # zero incoming step -> exactly zero out
    out0 = _quiet(eng.run, WATER, np.zeros(9))
    np.testing.assert_allclose(out0, 0.0, atol=0)

    # rigid translation step -> annihilated (B is translation-invariant)
    tr = np.tile([1.0, 0.0, 0.0], 3) * 0.05
    out_tr = _quiet(eng.run, WATER, tr.copy())
    assert np.linalg.norm(out_tr) < 1e-10

    # generic step: only the 2-dim bond-stretch content survives
    rng = np.random.default_rng(76)
    mv = 0.01 * rng.standard_normal(9)
    out = _quiet(eng.run, WATER, mv.copy())
    assert np.linalg.norm(out) < 0.5 * np.linalg.norm(mv)

    # no bonds detected -> original step returned unchanged
    far = np.array([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0],
                    [0.0, 50.0, 0.0]])
    eng2 = mod.GeodesicStepper(["O", "H", "H"])
    mv2 = rng.standard_normal(9)
    out2 = _quiet(eng2.run, far, mv2.copy())
    np.testing.assert_allclose(out2, mv2, atol=0)


def test_geodesic_live_metric_is_gram_of_b():
    mod = _ref_module("multioptpy.Optimizer.geodesic_step")
    eng = mod.GeodesicStepper(["O", "H", "H"])
    _, pairs, _ = eng.calculate_internal_coordinates(WATER)
    b = eng.calculate_b_matrix(WATER, pairs)
    g = eng.calculate_metric_tensor(b)
    np.testing.assert_allclose(g, b @ b.T, atol=1e-14)
    w = np.linalg.eigvalsh(g)
    assert np.all(w > 0)                       # independent bonds
