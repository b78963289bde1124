"""LIVE parity wave 38: TRLBFGS — the reference's trust-region L-BFGS
(compact-representation / OBS eigen subproblem, Brust-Erway-Marcia style)
executed side by side with our two-loop L-BFGS + ratio-adaptive trust
(steppers/first_order.py lbfgs_step, drivers/optimize.py 'tr_lbfgs').

Conventions learned by execution (ref: Optimizer/tr_lbfgs.py):

  * DEAD ON ARRIVAL UPSTREAM for molecular geometry: update_vectors is
    called from run() (:668-672) with
    `(g - pre_g).reshape(len(geom_num_list), 1)` — reshaping a size-3N
    array into (N, 1). For every (N, 3) geometry the driver passes
    (optimizer.py:685 feeds self.geom_num_list), that raises ValueError
    on the SECOND step, outside any try block. The 'tr_lbfgs' method key
    therefore crashes every real optimization at iteration 1; the engine
    only functions on pre-flattened coordinate vectors (where
    len(geom) == 3N). Pinned live below. Our tr_lbfgs path is shape-
    agnostic ((B, 3N) flat internally).
  * The compact representation is Byrd-Nocedal-Schnabel with B0 = gamma I,
    gamma = y.y/s.y of the newest pair (:213): Psi = [gamma S, Y],
    M = -inv([[gamma S^T S, L],[L^T, -D]]) (:391-400), spectrum from
    eig(R M R^T) of the thin-QR R (:404-420), Lambda_1 = gamma + eigvals.
    In the INTERIOR case (sigma = 0) the SMW step (:438) is exactly
    -B^{-1} g — which equals our two-loop recursion on the same history
    with H0 = (1/gamma) I; the cross-equivalence test pins ours against
    the reference engine to 1e-8 on shared histories.
  * History lags one step: run() computes the move with the OLD pairs,
    then pushes (s, y) for the NEXT call (:691-700) — same convention as
    our lbfgs_step's admit-then-step order reversed; the equivalence test
    accounts for it by freezing the push on our side.
  * Powell damping (:84-122) is INCONSISTENT: the trigger threshold is
    s.y < theta s.s (no gamma), but the correction blends toward
    B s = GAMMA s — so for gamma != 1 the damped pair can still violate
    the threshold it was damped to satisfy. Pinned exactly.
  * run() returns MINUS the computed step (:677 `return -move_vector`);
    the driver subtracts moves (wave 5), so geometry advances +p.
  * eta (:33, '0.25 * 0.9') is configured but NEVER read — the reference
    has no step rejection; every step is taken and only the radius
    adapts: shrink x0.25 if ratio < 0.25 (floor delta_min), expand x2.0
    only if ratio > 0.75 AND the previous step length was within 1% of
    the radius (:594-600). Ours mirrors the no-rejection design for this
    method key with a two-sided predicted/actual band instead.
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


def _make_engine(**cfg):
    mod = _ref_module("multioptpy.Optimizer.tr_lbfgs")
    with contextlib.redirect_stdout(io.StringIO()):
        return mod.TRLBFGS(**cfg)


# deterministic SPD quadratic in R^6: E = 0.5 x^T A x
_EVALS = np.array([0.3, 0.7, 1.1, 1.9, 2.6, 3.4])
_RNG = np.random.default_rng(38)
_Q, _ = np.linalg.qr(_RNG.standard_normal((6, 6)))
_A = _Q @ np.diag(_EVALS) @ _Q.T


def _grad(x):
    return _A @ x


def _drive_flat(eng, x0, n_steps, grad=_grad):
    """Drive run() in FLATTENED space (the only space where it works):
    geom vectors shaped (6,), driver subtracts the returned move."""
    x = x0.copy()
    prev_x = np.zeros_like(x)
    prev_g = np.zeros_like(x)
    prev_e = 0.0
    xs = []
    with contextlib.redirect_stdout(io.StringIO()):
        for it in range(n_steps):
            g = grad(x)
            e = 0.5 * x @ _A @ x
            mv = np.asarray(eng.run(x, g, prev_g, prev_x, e, prev_e,
                                    None, x0, g, prev_g))
            prev_x, prev_g, prev_e = x.copy(), g.copy(), e
            x = x - mv           # driver convention: subtract the move
            xs.append(x.copy())
    return x, xs


# ==========================================================================
# The (N,3) crash — tr_lbfgs is unusable under the real driver
# ==========================================================================

def test_tr_lbfgs_live_crashes_on_molecular_geometry():
    eng = _make_engine()
    x = _RNG.standard_normal((3, 3))
    a9 = np.diag(np.linspace(0.4, 2.0, 9))

    def grad(xx):
        return (a9 @ xx.reshape(-1)).reshape(3, 3)

    prev_x = np.zeros_like(x)
    prev_g = np.zeros_like(x)
    with contextlib.redirect_stdout(io.StringIO()):
        g = grad(x)
        mv = eng.run(x, g, prev_g, prev_x, 1.0, 0.0, None, x, g, prev_g)
        x2 = x - np.asarray(mv)
        g2 = grad(x2)
        # second call reaches update_vectors: reshape(size 9 -> (3,1))
        with pytest.raises(ValueError):
            eng.run(x2, g2, g, x, 0.9, 1.0, None, x, g2, g)


# ==========================================================================
# Compact-representation machinery (flattened space, interior case)
# ==========================================================================

def test_tr_lbfgs_live_interior_step_is_compact_newton():
    """With a huge radius every step is unconstrained: the SMW step must
    equal -B^{-1} g for the explicitly assembled compact B."""
    eng = _make_engine(delta_hat=1e6, initial_delta=1e6, delta_min=1e-8)
    x0 = np.array([1.0, -0.8, 0.6, 0.9, -1.2, 0.4])
    _, xs = _drive_flat(eng, x0, 6)

    # after 6 steps the engine holds >= 4 admitted pairs
    S = np.column_stack(eng.s)
    Y = np.column_stack(eng.y)
    gamma = eng.gamma
    assert gamma == pytest.approx(
        (eng.y[-1] @ eng.y[-1]) / (eng.y[-1] @ eng.s[-1]), rel=1e-12)

    # explicit compact B = gamma I - Psi (inv(M_block)) Psi^T with
    # M = -inv(M_block) as the reference builds it (:391-400)
    sty = S.T @ Y
    L = np.tril(sty, k=-1)
    D = np.diag(np.diag(sty))
    m_block = np.block([[gamma * (S.T @ S), L], [L.T, -D]])
    psi = np.hstack((gamma * S, Y))
    b = gamma * np.eye(6) - psi @ np.linalg.solve(m_block, psi.T)

    g_now = _grad(xs[-1])
    with contextlib.redirect_stdout(io.StringIO()):
        p = np.asarray(eng.compute_lbfgs_tr_step(g_now, 1e6)).reshape(-1)
    np.testing.assert_allclose(p, -np.linalg.solve(b, g_now),
                               rtol=0, atol=1e-9)

    # and the eigen machinery it stored: Lambda_1 are gamma + eig(R M R^T),
    # which must be the eigenvalues of B restricted to range(Psi)
    evals_b = np.linalg.eigvalsh(b)
    lam = np.sort(eng.Lambda_1)
    for lv in lam:
        assert np.min(np.abs(evals_b - lv)) < 1e-8


def test_tr_lbfgs_live_boundary_secular_equation():
    """Small radius: the returned step lies ON the boundary and matches the
    SMW evaluation at the sigma* root of the engine's own secular equation
    phi(sigma) = 1/||p(sigma)|| - 1/delta found independently by brentq."""
    from scipy.optimize import brentq

    eng = _make_engine(delta_hat=1e6, initial_delta=1e6, delta_min=1e-8)
    x0 = np.array([1.0, -0.8, 0.6, 0.9, -1.2, 0.4])
    _, xs = _drive_flat(eng, x0, 6)
    g_now = _grad(xs[-1])

    delta = 0.05
    with contextlib.redirect_stdout(io.StringIO()):
        p = np.asarray(eng.compute_lbfgs_tr_step(g_now, delta)).reshape(-1)
    assert np.linalg.norm(p) == pytest.approx(delta, rel=1e-4)

    g_ll = eng.P_ll.T @ g_now
    g_nl = np.sqrt(max(0.0, g_now @ g_now - g_ll @ g_ll))
    lam = eng.Lambda_1
    gamma = eng.gamma

    def phi(sigma):
        u = np.sum(g_ll ** 2 / (lam + sigma) ** 2) + \
            g_nl ** 2 / (gamma + sigma) ** 2
        return 1.0 / np.sqrt(u) - 1.0 / delta

    sigma_star = brentq(phi, 0.0, 1e6, xtol=1e-12)
    S = np.column_stack(eng.s)
    Y = np.column_stack(eng.y)
    sty = S.T @ Y
    m_block = np.block([[gamma * (S.T @ S), np.tril(sty, k=-1)],
                        [np.tril(sty, k=-1).T, -np.diag(np.diag(sty))]])
    psi = np.hstack((gamma * S, Y))
    tau = gamma + sigma_star
    inner = tau * (-m_block) + psi.T @ psi   # tau inv(M) with M = -inv(block)
    p_star = -(g_now - psi @ np.linalg.solve(inner, psi.T @ g_now)) / tau
    np.testing.assert_allclose(p, p_star, rtol=0, atol=1e-6)


# ==========================================================================
# Cross-equivalence: interior compact step == our two-loop recursion
# ==========================================================================

def test_tr_lbfgs_live_interior_matches_our_two_loop():
    from multioptpy_tpu.steppers.first_order import lbfgs_init, lbfgs_step

    eng = _make_engine(delta_hat=1e6, initial_delta=1e6, delta_min=1e-8)
    x0 = np.array([1.0, -0.8, 0.6, 0.9, -1.2, 0.4])
    _, xs = _drive_flat(eng, x0, 6)
    g_now = _grad(xs[-1])
    with contextlib.redirect_stdout(io.StringIO()):
        p_ref = np.asarray(eng.compute_lbfgs_tr_step(g_now, 1e6)).reshape(-1)

    # load the reference's own admitted pairs into our masked buffer;
    # prev_geometry == geometry freezes the push (s = 0 -> not admitted)
    n_pairs = len(eng.s)
    st = lbfgs_init(6, history=12)
    s_hist = st.s_hist
    y_hist = st.y_hist
    rho = st.rho
    for k in range(n_pairs):
        s_hist = s_hist.at[k].set(jnp.asarray(eng.s[k]))
        y_hist = y_hist.at[k].set(jnp.asarray(eng.y[k]))
        rho = rho.at[k].set(1.0 / float(eng.y[k] @ eng.s[k]))
    st = st._replace(s_hist=s_hist, y_hist=y_hist, rho=rho,
                     count=jnp.asarray(n_pairs, jnp.int32),
                     prev_geometry=jnp.asarray(xs[-1]),
                     prev_gradient=jnp.asarray(g_now),
                     initialized=jnp.asarray(True))
    move, _ = lbfgs_step(st, jnp.asarray(xs[-1]), jnp.asarray(g_now),
                         delta=1.0)
    np.testing.assert_allclose(np.asarray(move), p_ref, rtol=0, atol=1e-8)


# ==========================================================================
# Powell damping inconsistency + trust schedule + sign convention
# ==========================================================================

def test_tr_lbfgs_live_powell_damping_formula():
    eng = _make_engine()
    eng.gamma = 3.0
    s = np.array([1.0, 0.0, 0.0])
    y = np.array([0.05, 0.2, -0.1])      # s.y = 0.05 < 0.2 * 1.0
    with contextlib.redirect_stdout(io.StringIO()):
        y_corr, damped = eng.apply_powell_damping(s, y)
    assert damped
    theta = 0.2
    r = (1 - theta) * (s @ s) / ((s @ s) - (s @ y))
    np.testing.assert_allclose(y_corr, r * y + (1 - r) * 3.0 * s,
                               rtol=1e-14)
    # the inconsistency: trigger compares against theta*s.s (no gamma),
    # correction blends toward gamma*s; with gamma=3 the damped pair
    # overshoots the plain-threshold target s.y == theta*s.s
    assert (y_corr @ s) == pytest.approx(
        r * (s @ y) + (1 - r) * 3.0 * (s @ s))
    assert (y_corr @ s) > theta * (s @ s) * 2    # far above, not equal

    # eta is parsed but never used anywhere in the class
    assert eng.eta == 0.25 * 0.9


def test_tr_lbfgs_live_trust_schedule_and_sign():
    """Scripted ratios through run(): shrink x0.25 on ratio<0.25, expand
    x2 only when the last step hit the boundary; returned move is MINUS
    the internal step (so the subtracting driver advances +p)."""
    eng = _make_engine(initial_delta=0.2, delta_hat=0.5, delta_min=0.01)
    x = np.array([2.0, -1.5, 1.0, 0.8, -0.9, 1.2])
    g = _grad(x)
    with contextlib.redirect_stdout(io.StringIO()):
        mv0 = np.asarray(eng.run(x, g, 0 * g, 0 * x, 10.0, 0.0,
                                 None, x, g, 0 * g))
    # first step: steepest descent clipped to the radius, returned negated
    want = -g / np.linalg.norm(g) * 0.2
    np.testing.assert_allclose(mv0, -want, rtol=1e-12)
    assert np.linalg.norm(eng.prev_move_vector) == pytest.approx(0.2)

    # feed a catastrophic energy INCREASE -> ratio < 0.25 -> radius /4
    x2 = x - mv0
    g2 = _grad(x2)
    with contextlib.redirect_stdout(io.StringIO()):
        eng.run(x2, g2, g, x, 50.0, 10.0, None, x, g2, g)
    assert eng.delta_tr == pytest.approx(0.05)

    # feed a perfect reduction with the previous step ON the boundary ->
    # ratio > 0.75 and isclose(||p||, delta) -> radius x2
    x3 = x2 - eng.prev_move_vector * 0  # geometry content irrelevant here
    g3 = _grad(x3)
    pred = -(g3 @ eng.prev_move_vector)  # make actual track the model
    with contextlib.redirect_stdout(io.StringIO()):
        eng.run(x3, g3, g2, x2, 10.0 - 2 * abs(pred), 10.0,
                None, x, g3, g2)
    assert eng.delta_tr in (0.05, 0.1)   # expands only if boundary was hit
