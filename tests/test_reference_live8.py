"""LIVE parity wave 8: GDIIS coefficient solve and the FIRE2 engine,
executed through the ACTUAL reference code side by side with ours.

Conventions learned by execution:

  * The reference's GDIIS coefficient solve (gdiis.py:143) is the
    standard bordered system [B 1; 1 0][c; lam] = [0; 1] plus 1e-8
    diagonal regularization and an SVD singular-value floor
    (gdiis.py:94-133). On a well-conditioned error set those extras are
    O(1e-8) perturbations, so its coefficients match our
    _bordered_diis_coefficients (reg 1e-10*scale) to ~1e-5 and both sum
    to 1 exactly.
  * The reference's FIRE2 (fire2.py:104-196) deviates from the
    published FIRE2.0 (Guenole et al., CMS 175 (2020) 109584) it cites,
    in three executable ways — all pinned by replaying its recursion:
      (1) velocity MIXING is applied AFTER the Euler kick, using the
          post-kick |v| (fire2.py:155-169; the paper and our fire2_step
          mix the inertial velocity BEFORE the kick);
      (2) the acceleration gate increments Nsteps first and then tests
          Nsteps > N_min (fire2.py:124-127), i.e. acceleration begins
          one step EARLIER than our post-increment n_good > n_acc gate
          with the same constant;
      (3) the uphill half-step-back correction -0.5*dt*v uses the
          ALREADY-SHRUNK dt (dt is updated at :131 before the
          correction at :144), while ours backs up with the dt the
          stale velocity was integrated with.
    Sign convention as wave 5's FIRE: v_ref = -v_ours, driver subtracts
    => ref moves replay against +gradient.

Ref anchors: Optimizer/gdiis.py:94-206, Optimizer/fire2.py:104-196.
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

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
# GDIIS coefficients
# ==========================================================================

def test_gdiis_coefficients_live():
    gdiis_mod = _ref_module("multioptpy.Optimizer.gdiis")
    from multioptpy_tpu.steppers.diis import _bordered_diis_coefficients

    rng = np.random.default_rng(31)
    n, dim = 4, 12
    errs = [rng.normal(size=dim) for _ in range(n)]

    ref = gdiis_mod.GDIIS()
    with contextlib.redirect_stdout(io.StringIO()):
        ref_c = np.asarray(ref._solve_gdiis_equations(
            [e.copy() for e in errs]))

    e_hist = jnp.asarray(np.stack(errs))
    ours_c = np.asarray(_bordered_diis_coefficients(
        e_hist, jnp.ones(n)))

    assert ref_c.sum() == pytest.approx(1.0, abs=1e-8)
    assert ours_c.sum() == pytest.approx(1.0, abs=1e-8)
    assert np.allclose(ref_c, ours_c, atol=1e-5), (
        f"ref {ref_c} vs ours {ours_c}")

    # exact bordered-system solution as the shared oracle
    b = np.array([[np.dot(errs[i], errs[j]) for j in range(n)]
                  for i in range(n)])
    big = np.zeros((n + 1, n + 1))
    big[:n, :n] = b
    big[:n, n] = big[n, :n] = 1.0
    rhs = np.zeros(n + 1)
    rhs[n] = 1.0
    exact = np.linalg.solve(big, rhs)[:n]
    assert np.allclose(ref_c, exact, atol=1e-5)
    assert np.allclose(ours_c, exact, atol=1e-5)


def test_gdiis_quality_weighting_live():
    """Quality weights scale B_ij by sqrt(q_i q_j) (gdiis.py:163-166) AND
    add quality-dependent diagonal regularization (:115-119) — pinned by
    reproducing the executed coefficients from that exact formula."""
    gdiis_mod = _ref_module("multioptpy.Optimizer.gdiis")

    rng = np.random.default_rng(41)
    n, dim = 3, 8
    errs = [rng.normal(size=dim) for _ in range(n)]
    qual = [1.0, 0.5, 0.8]

    ref = gdiis_mod.GDIIS()
    with contextlib.redirect_stdout(io.StringIO()):
        ref_c = np.asarray(ref._solve_gdiis_equations(
            [e.copy() for e in errs], qualities=list(qual)))

    reg = 1e-8
    b = np.zeros((n + 1, n + 1))
    for i in range(n):
        for j in range(n):
            b[i, j] = np.sqrt(qual[i] * qual[j]) * np.dot(errs[i], errs[j])
    for i in range(n):
        b[i, i] += reg                       # _condition_b_matrix step 1
        b[i, i] += reg * (2.0 - qual[i]) / qual[i]   # step 2
    b[n, :n] = b[:n, n] = 1.0
    rhs = np.zeros(n + 1)
    rhs[n] = 1.0
    expect = np.linalg.solve(b, rhs)[:n]
    assert np.allclose(ref_c, expect, atol=1e-9), (
        f"ref {ref_c} vs quirk formula {expect}")


# ==========================================================================
# FIRE2
# ==========================================================================

def _replay_ref_fire2(gradients, n_min=5):
    """Inline replica of the reference FIRE2 recursion (fire2.py:104-196)
    with default parameters: dt0=0.1, alpha_start=0.25, f_inc=1.1,
    f_dec=0.5, f_alpha=0.99, dt in [0.01, 1.0], maxstep=0.2,
    halfstepback=True."""
    dt, alpha, nsteps = 0.1, 0.25, 0
    v = np.zeros_like(gradients[0])
    moves = []
    for bg in gradients:
        power = float(np.dot(v, bg))
        correction = 0.0
        if power > 0.0:
            nsteps += 1
            if nsteps > n_min:                     # post-increment test
                dt = min(dt * 1.10, 1.0)
                alpha *= 0.99
        else:
            nsteps = 0
            dt = max(dt * 0.50, 0.01)              # dt shrinks FIRST
            alpha = 0.25
            if power < 0.0:
                correction = -0.5 * dt * v         # ...then uses NEW dt
            v = np.zeros_like(v)
        v = v + dt * bg                            # Euler kick FIRST
        if power > 0.0:
            v_norm, f_norm = np.linalg.norm(v), np.linalg.norm(bg)
            if v_norm > 1e-10 and f_norm > 1e-10:  # ...mixing AFTER, with
                v = (1.0 - alpha) * v + alpha * (v_norm / f_norm) * bg
        move = dt * v + correction
        mn = np.linalg.norm(move)
        if mn > 0.2:
            move = move * (0.2 / mn)
        moves.append(move.copy())
    return moves


def test_fire2_engine_replay_live():
    fire2_mod = _ref_module("multioptpy.Optimizer.fire2")

    rng = np.random.default_rng(19)
    dim = 6
    a = np.diag(np.linspace(0.5, 2.0, dim))
    x = rng.normal(size=dim)

    eng = fire2_mod.FIRE2(display_flag=False)
    grads = []
    ref_moves = []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(8):
            bg = a @ x
            grads.append(bg.copy())
            mv = np.asarray(eng.run(x.copy(), bg.copy(), B_e=0.5 * x @ a @ x))
            ref_moves.append(mv.copy())
            x = x - mv                         # driver subtracts

    replay = _replay_ref_fire2(grads)
    for k, (r, e) in enumerate(zip(ref_moves, replay)):
        assert np.allclose(r, e, atol=1e-13), (
            f"step {k}: ref {r} vs replay {e}")


def test_fire2_ours_published_semantics():
    """Ours (steppers/first_order.py fire2_step) keeps the PUBLISHED
    FIRE2.0 ordering: inertial velocity is mixed BEFORE the kick, and an
    uphill step zeroes the velocity, corrects -dt/2*v with the OLD dt,
    and does not advance along the stale velocity."""
    from multioptpy_tpu.steppers.first_order import FireState, fire2_step

    dim = 6
    g = jnp.asarray(np.linspace(0.5, 1.0, dim))
    v_up = np.asarray(np.linspace(0.3, 0.4, dim))   # v.force < 0: uphill
    dt_old = 0.2
    state = FireState(velocity=jnp.asarray(v_up), dt=jnp.asarray(dt_old),
                      alpha=jnp.asarray(0.1), n_good=jnp.asarray(3))
    move, new = fire2_step(state, g)
    dt_new = float(new.dt)
    assert dt_new == pytest.approx(0.5 * dt_old)
    # move = dt_new * (0 + dt_new * force) - 0.5 * dt_OLD * v
    force = -np.asarray(g)
    expect = dt_new * (dt_new * force) - 0.5 * dt_old * v_up
    assert np.allclose(np.asarray(move), expect, atol=1e-12)
    # velocity reset: only the fresh kick survives
    assert np.allclose(np.asarray(new.velocity), dt_new * force, atol=1e-12)
