"""LIVE parity wave 51: the curvature-based NEB clocks — LBFGS_NEB and
ConjugateGradientNEB — executed side by side with our lbfgs/cg band
clocks (drivers/neb.py lbfgs branch, steppers/first_order.cg_step).

Conventions learned by execution (ref: Optimizer/lbfgs_neb.py,
conjugate_gradient_neb.py):

  * LBFGS_NEB keeps PER-IMAGE two-loop histories fed with FORCE
    differences (y = dF, not dg); the double sign flip (q = -F, y = -dg)
    cancels, so with one stored pair each image takes the EXACT Newton
    step on an isotropic quadratic (pinned: call 3 lands every image on
    its minimum to 1e-12). The history is updated AFTER the step is
    computed, so the first curvature-informed step is call 3, not 2 —
    and the "previous force" is read from the PRE_TOTAL_VELOCITY
    argument (API slot reuse, :325-329). Degenerate pairs |y.s| < 1e-10
    get a HARDCODED rho = 1000.0 instead of being skipped (:94-97).
    maxstep clamps on the longest PER-ATOM row norm per image;
    step_scale adapts 1.1x/0.5x on the improvement-vs-deterioration
    count and stays put on ties (equal energies -> exactness preserved).
  * ConjugateGradientNEB treats the FORCE as "g" throughout — for
    FR/PR/HS the double negation cancels, but the "orthogonality"
    restart actually tests SIMILARITY (restarts when successive forces
    are nearly parallel, |cos| > 0.8) and iter % restart_cycles == 0
    restarts EVERY node on every 10th call including the first. Its
    Hager-Zhang branch mis-transcribes the HZ beta (:160): it computes
    (g.y - 2 (g.y)(y.d)/(y.y)) / (y.d) — the published formula is
    (g.y - 2 (g.d)(y.y)/(y.d)) / (y.d); the two disagree on generic
    data (pinned numerically). Non-descent directions are reset to
    steepest descent (:182-185). Our cg_step implements the textbook
    FR/PR/HS/DY/HZ formulas on gradients.
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
# LBFGS_NEB
# ==========================================================================

def test_lbfgs_neb_live_exact_newton_on_quadratic_third_call():
    mod = _ref_module("multioptpy.Optimizer.lbfgs_neb")
    eng = mod.LBFGS_NEB(maxstep=None, bohr2angstroms=1.0,
                        initial_step_scale=1.0)
    rng = np.random.default_rng(100)
    n_img, n_atom = 3, 2
    x_star = rng.standard_normal((n_img, n_atom, 3))
    k = np.array([0.5, 1.3, 2.0])              # per-image stiffness

    def forces(x):
        return -k[:, None, None] * (x - x_star)

    e_const = np.zeros(n_img)                  # ties keep step_scale = 1
    x0 = x_star + rng.standard_normal((n_img, n_atom, 3))
    f0 = forces(x0)
    x1 = _quiet(eng.LBFGS_NEB_calc, x0, f0, None, 0, None, None,
                e_const, None, None)
    np.testing.assert_allclose(x1, x0 + f0, atol=1e-14)  # SD first call

    f1 = forces(x1)
    x2 = _quiet(eng.LBFGS_NEB_calc, x1, f1, f0, 1, None, None,
                e_const, e_const, x0)
    # history updated AFTER the step: call 2 is still plain scaled force
    np.testing.assert_allclose(x2, x1 + f1, atol=1e-14)

    f2 = forces(x2)
    x3 = _quiet(eng.LBFGS_NEB_calc, x2, f2, f1, 2, None, None,
                e_const, e_const, x1)
    # call 3 holds one (s, y) pair per image -> exact Newton landing
    np.testing.assert_allclose(x3, x_star, atol=1e-12)


def test_lbfgs_neb_live_degenerate_pair_hardcodes_rho():
    mod = _ref_module("multioptpy.Optimizer.lbfgs_neb")
    eng = mod.LBFGS_NEB(bohr2angstroms=1.0)
    s = np.array([[1.0, 0.0, 0.0]])
    y = np.array([[0.0, 1.0, 0.0]])            # y.s = 0
    _quiet(eng.update_vectors, [s], [y])
    assert eng.rho_images[0][0] == 1000.0
    assert eng.gamma_images[0] == 1.0          # gamma untouched


def test_lbfgs_neb_live_maxstep_clamps_on_longest_atom_row():
    mod = _ref_module("multioptpy.Optimizer.lbfgs_neb")
    eng = mod.LBFGS_NEB(maxstep=0.1, bohr2angstroms=1.0)
    step = np.array([[0.3, 0.0, 0.0], [0.03, 0.0, 0.0]])
    out = eng.determine_step([step])[0]
    # scaled by 0.1/0.3: the small atom shrinks too (global per-image)
    np.testing.assert_allclose(out, step / 3.0, atol=1e-14)


# ==========================================================================
# ConjugateGradientNEB
# ==========================================================================

def _cg(mod, method, it=3):
    eng = _quiet(mod.ConjugateGradientNEB, cg_method=method,
                 bohr2angstroms=1.0)
    _quiet(eng.initialize_data, 1)
    eng.iter = it                              # dodge iter%10 restart
    return eng


def test_cg_neb_live_hz_beta_is_mistranscribed():
    mod = _ref_module("multioptpy.Optimizer.conjugate_gradient_neb")
    eng = _cg(mod, "HZ")
    rng = np.random.default_rng(101)
    f_prev = rng.standard_normal((2, 3))
    d_prev = rng.standard_normal((2, 3))
    f = rng.standard_normal((2, 3))
    # keep |cos(f, f_prev)| below the similarity-restart band
    f = f - (np.vdot(f, f_prev) / np.vdot(f_prev, f_prev)) * f_prev
    eng.prev_forces[0] = f_prev
    eng.prev_directions[0] = d_prev
    got = _quiet(eng.compute_cg_direction, f, 0)

    g = f.ravel()
    gp = f_prev.ravel()
    d = d_prev.ravel()
    y = (f - f_prev).ravel()
    eps = 1e-10
    # the code's formula
    beta_code = (g @ y - 2 * (g @ y) * (y @ d) / max(eps, y @ y)) \
        / max(eps, y @ d)
    eta = 0.4
    beta_code = max(-eta * (gp @ gp) / max(eps, d @ d), beta_code)
    want = f + beta_code * d_prev
    if np.vdot(want, f) < 0:
        want = f.copy()
    np.testing.assert_allclose(got, want, atol=1e-13)

    # the published Hager-Zhang beta disagrees on this data
    beta_true = (g @ y - 2 * (g @ d) * (y @ y) / max(eps, y @ d)) \
        / max(eps, y @ d)
    beta_true = max(-eta * (gp @ gp) / max(eps, d @ d), beta_true)
    assert abs(beta_true - beta_code) > 1e-6


def test_cg_neb_live_similarity_restart_and_first_call_restart():
    mod = _ref_module("multioptpy.Optimizer.conjugate_gradient_neb")
    # nearly parallel successive forces -> "orthogonality" > 0.8 ->
    # restart (beta = 0, pure force direction)
    eng = _cg(mod, "FR", it=3)
    f_prev = np.ones((1, 3))
    d_prev = np.array([[5.0, -2.0, 1.0]])
    f = 1.01 * f_prev
    eng.prev_forces[0] = f_prev
    eng.prev_directions[0] = d_prev
    got = _quiet(eng.compute_cg_direction, f, 0)
    np.testing.assert_allclose(got, f, atol=1e-14)

    # iter % 10 == 0 restarts even with dissimilar forces
    eng2 = _cg(mod, "FR", it=10)
    rng = np.random.default_rng(102)
    f_prev2 = rng.standard_normal((1, 3))
    f2 = rng.standard_normal((1, 3))
    f2 = f2 - (np.vdot(f2, f_prev2) / np.vdot(f_prev2, f_prev2)) * f_prev2
    eng2.prev_forces[0] = f_prev2
    eng2.prev_directions[0] = rng.standard_normal((1, 3))
    got2 = _quiet(eng2.compute_cg_direction, f2, 0)
    np.testing.assert_allclose(got2, f2, atol=1e-14)


def test_cg_neb_live_non_descent_reset():
    mod = _ref_module("multioptpy.Optimizer.conjugate_gradient_neb")
    eng = _cg(mod, "FR", it=3)
    f_prev = np.array([[10.0, 0.0, 0.0]])
    f = np.array([[0.0, 1.0, 0.0]])            # orthogonal: no restart
    d_prev = np.array([[0.0, -200.0, 0.0]])    # drags direction uphill
    eng.prev_forces[0] = f_prev
    eng.prev_directions[0] = d_prev
    got = _quiet(eng.compute_cg_direction, f, 0)
    # FR beta = |f|^2/|f_prev|^2 = 0.01; f + 0.01 d = (0,-1,0): descent
    # check fails -> reset to the raw force
    np.testing.assert_allclose(got, f, atol=1e-14)
