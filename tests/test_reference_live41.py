"""LIVE parity wave 41: the ML first-order zoo — the reference's
Adabelief / RADAM / LARS / LookAhead / Prodigy / ABC_FIRE /
GradientDescent executed side by side with our steppers (optax-backed
steppers/ml.py, steppers/first_order.py abc_fire_step / sd_step).

Conventions learned by execution (ref: Optimizer/*.py):

  * Adabelief (adabelief.py:22-44) SKIPS BIAS CORRECTION entirely: the
    published AdaBelief (arXiv:2010.07468 Algorithm 2) divides m and s
    by (1-beta^t); the reference steps DELTA m_t / sqrt(v_t + eps) raw.
    With beta_m=0.9, beta_v=0.999 the first step is therefore a SIGN
    step of fixed magnitude 0.003/sqrt(0.00081) = 0.105409... per
    component (pinned) — 3.5x the published DELTA-bounded first step.
    Our optax.adabelief applies the published bias correction.
  * RADAM (radam.py:22-62) adds Epsilon=1e-12 OUTSIDE the copy() into
    the STORED second moment every call — v accumulates eps*t bias over
    a run even at zero gradient (pinned); the rectification gate,
    rho/r formulas, and the l_alpha = sqrt(|1-beta_v^t|/v) step match
    the published paper otherwise (mirror-exact below).
  * LARS (lars.py:14-21) is a SCALAR learning-rate multiplier, not a
    stepper: lr = ||x|| / (||move|| + 0.6 ||x||) with the "weight norm"
    = the norm of the WHOLE geometry clipped to [0, 10] — molecular
    coordinates play the role the paper gives to per-layer weights.
  * LookAhead (lookahead.py:18-39) OVERWRITES its slow weights with the
    current geometry on EVERY non-sync call (:21) — at a sync step the
    "slow" point is just the geometry of the previous call, not the
    k-call-old anchor of arXiv:1907.08610; the fast point blended in is
    the LOWEST-ENERGY geometry of the window (argmin, :31), and the
    returned move is -(new - geom) (the driver subtracts move vectors).
    Non-sync calls pass the incoming move_vector through unchanged.
  * Prodigy (prodigy.py:22-57) CRASHES ON MOLECULAR (N,3) GEOMETRY:
    new_adam_r's reshape(1, len(B_g)) (:44) needs a column vector
    (len = 3N only when pre-flattened); on (N,3) input len = N and the
    reshape raises ValueError on every call (pinned, like TRLBFGS wave
    38 / C2DIIS wave 39). On flattened input it is the published
    algorithm with lr folded as DELTA=0.1, d0=0.03 — EXCEPT that the s
    accumulator is STATELESS: run() stores adam_m/adam_v/adam_r back
    but never `self.adam_s = new_adam_s`, so s stays at its init zeros
    and each call's denominator is the single fresh term
    (1-sqrt(beta_v)) DELTA g d^2. The d-estimate's denominator
    ||s_k||_1 of arXiv:2306.06101 Algorithm 1 therefore never
    accumulates and d inflates early (mirror-exact pin below).
  * ABC_FIRE (abc_fire.py:26-67) applies the ABC bias-correction factor
    1/(1-(1-alpha)^k) ONLY to the (1-alpha) v_pre term — the published
    ABC-FIRE (Comput. Mater. Sci. 218, 111978) corrects the WHOLE mixed
    velocity [(1-alpha) v + alpha |v| F_hat]; our abc_fire_step
    (steppers/first_order.py:114-118) implements the published form.
    Also: the denominator k is sub_iter BEFORE increment (0 on the
    first call — saved from 1e10 blowup only because v_pre=0), its
    reshape(1, len(geom)) dot products crash on (N,3) input from the
    VERY FIRST call (the end-of-run sub_iter reset at :66 runs
    unconditionally), and the uphill reset zeroes the mixed velocity
    BEFORE the +dt B_g kick, so motion restarts immediately.
  * GradientDescent (gradientdescent.py:14-23): move = 1.0 * B_g, the
    "Pseudo-IRC" — identical to our sd_step(delta=1).
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
# Adabelief
# ==========================================================================

def test_adabelief_live_no_bias_correction():
    mod = _ref_module("multioptpy.Optimizer.adabelief")
    eng = mod.Adabelief()
    rng = np.random.default_rng(41)
    x = rng.standard_normal((4, 3))
    m = np.zeros_like(x)
    v = np.zeros_like(x)
    for _ in range(5):
        g = rng.standard_normal((4, 3))
        got = np.array(_quiet(eng.run, x, g))
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * (g - m) ** 2
        want = 0.03 * m / np.sqrt(v + 1e-15)
        np.testing.assert_allclose(got, want, atol=1e-14)


def test_adabelief_live_first_step_is_a_sign_step():
    mod = _ref_module("multioptpy.Optimizer.adabelief")
    eng = mod.Adabelief()
    x = np.zeros((2, 3))
    g = np.array([[0.5, -0.2, 1.0], [-3.0, 0.1, 0.7]])
    got = np.array(_quiet(eng.run, x, g))
    # m1 = 0.1 g, v1 = 0.001 (0.9 g)^2 -> |move| = 0.003/sqrt(0.00081)
    mag = 0.003 / np.sqrt(0.00081)
    np.testing.assert_allclose(got, mag * np.sign(g), rtol=1e-9)
    assert mag == pytest.approx(0.10540925533894598)


# ==========================================================================
# RADAM
# ==========================================================================

def test_radam_live_mirror_exact():
    mod = _ref_module("multioptpy.Optimizer.radam")
    eng = mod.RADAM()
    rng = np.random.default_rng(42)
    x = rng.standard_normal((3, 3))
    bm, bv, eps, delta = 0.9, 0.999, 1e-12, 0.03
    rho_inf = 2.0 / (1.0 - bv) - 1.0
    m = np.zeros_like(x)
    v = np.zeros_like(x)
    for t in range(1, 9):
        g = rng.standard_normal((3, 3))
        got = np.array(_quiet(eng.run, x, g))
        m = bm * m + (1 - bm) * g
        v = bv * v + (1 - bv) * (g - m) ** 2 + eps   # eps goes INTO v
        m_hat = m / (1 - bm ** t)
        rho = rho_inf - (2.0 * t * bv ** t) / (1 - bv ** t)
        if rho > 4.0:
            l_alpha = np.sqrt(abs(1 - bv ** t) / v)
            r = np.sqrt(((rho - 4) * (rho - 2) * rho_inf)
                        / ((rho_inf - 4) * (rho_inf - 2) * rho))
            want = delta * r * m_hat * l_alpha
        else:
            want = delta * m_hat
        np.testing.assert_allclose(got, want, atol=1e-13)


def test_radam_live_epsilon_accumulates_in_stored_v():
    mod = _ref_module("multioptpy.Optimizer.radam")
    eng = mod.RADAM()
    x = np.ones((2, 3))
    g0 = np.zeros((2, 3))
    for _ in range(3):
        _quiet(eng.run, x, g0)
    # v after 3 zero-gradient calls: eps (1 + bv + bv^2), NOT zero
    bv, eps = 0.999, 1e-12
    np.testing.assert_allclose(eng.adam_v,
                               eps * (1 + bv + bv * bv), rtol=1e-12)


# ==========================================================================
# LARS / LookAhead
# ==========================================================================

def test_lars_live_scalar_lr_formula_and_clip():
    mod = _ref_module("multioptpy.Optimizer.lars")
    eng = mod.LARS()
    rng = np.random.default_rng(43)
    x = rng.standard_normal((4, 3))
    mv = 0.1 * rng.standard_normal((4, 3))
    got = _quiet(eng.run, x, None, None, None, 0.0, 0.0, None, None,
                 None, None, mv)
    w = min(np.linalg.norm(x), 10.0)
    want = w / (np.linalg.norm(mv) + w * 0.6)
    assert got == pytest.approx(want, rel=1e-12)
    assert np.isscalar(got) or np.ndim(got) == 0
    # clip at 10: a huge geometry saturates the weight norm
    got_big = _quiet(eng.run, 1e6 * x, None, None, None, 0.0, 0.0, None,
                     None, None, None, mv)
    want_big = 10.0 / (np.linalg.norm(mv) + 6.0)
    assert got_big == pytest.approx(want_big, rel=1e-12)


def test_lookahead_live_slow_point_is_previous_geometry():
    mod = _ref_module("multioptpy.Optimizer.lookahead")
    eng = mod.LookAhead(k=3, alpha=0.5)
    rng = np.random.default_rng(44)
    geoms = [rng.standard_normal((2, 3)) for _ in range(4)]
    energies = [5.0, 1.0, 7.0, 3.0]           # best is call 1
    mv_in = rng.standard_normal((2, 3))
    outs = []
    for it in range(4):
        outs.append(_quiet(eng.run, geoms[it], None, None, None,
                           energies[it], 0.0, None, None, None, None,
                           mv_in))
    # non-sync calls pass the incoming move through unchanged
    for it in range(3):
        np.testing.assert_allclose(outs[it], mv_in)
    # sync at iter 3: slow point = geoms[2] (overwritten every call,
    # NOT the k-old anchor), fast point = argmin-energy geom = geoms[1]
    new = 0.5 * geoms[2] + 0.5 * geoms[1]
    np.testing.assert_allclose(outs[3], -(new - geoms[3]), atol=1e-14)
    # histories cleared after sync
    assert eng.fast_geom_num_list_history == []


# ==========================================================================
# Prodigy
# ==========================================================================

def test_prodigy_live_crashes_on_molecular_geometry():
    mod = _ref_module("multioptpy.Optimizer.prodigy")
    eng = mod.Prodigy()
    rng = np.random.default_rng(45)
    x = rng.standard_normal((3, 3))
    g = rng.standard_normal((3, 3))
    with pytest.raises(ValueError):
        _quiet(eng.run, x, g, None, None, 0.0, 0.0, None, None)


def test_prodigy_live_mirror_exact_on_columns():
    mod = _ref_module("multioptpy.Optimizer.prodigy")
    eng = mod.Prodigy()
    rng = np.random.default_rng(46)
    x0 = rng.standard_normal((9, 1))
    bm, bv, delta, eps = 0.9, 0.999, 0.1, 1e-12
    d = 0.03
    m = np.zeros_like(x0)
    v = np.zeros_like(x0)
    r = 0.0
    x = x0.copy()
    for _ in range(5):
        g = rng.standard_normal((9, 1))
        got = np.array(_quiet(eng.run, x, g, None, None, 0.0, 0.0,
                              None, None))
        m = bm * m + (1 - bm) * g * d
        v = bv * v + (1 - bv) * (g * d) ** 2
        # adam_s is never written back: the denominator is one term
        s = (1 - np.sqrt(bv)) * delta * g * d * d
        r = np.sqrt(bv) * r + (1 - np.sqrt(bv)) * float(g.T @ (x0 - x)) \
            * delta * d * d
        d_old = d
        d = float(max(r / np.abs(s).sum(), d))
        want = delta * d * m / (np.sqrt(v) + eps * d_old)
        np.testing.assert_allclose(got, want, atol=1e-13)
        x = x - 0.2 * g                        # wander so r moves


# ==========================================================================
# ABC_FIRE
# ==========================================================================

def _abc_mirror(gs):
    """Exact mirror of ABC_FIRE.run on column vectors."""
    dt, alpha, n_reset = 0.1, 0.1, 0
    sub_iter, it = 0, 0
    v_pre = np.zeros_like(gs[0])
    moves = []
    for g in gs:
        vel = (1.0 / (1.0 - (1.0 - alpha) ** sub_iter + 1e-10)) \
            * (1.0 - alpha) * v_pre \
            + alpha * (np.linalg.norm(v_pre) / np.linalg.norm(g)) * g
        if it > 0 and float(v_pre.T @ g) > 0:
            if n_reset > 5:
                dt = min(dt * 1.10, 0.8)
                alpha *= 0.99
            n_reset += 1
        else:
            vel = vel * 0.0
            alpha = 0.1
            dt *= 0.50
            n_reset = 0
        vel = vel + dt * g
        moves.append(dt * vel)
        v_pre = vel
        it += 1
        sub_iter += 1
        if float(vel.T @ g) < 0:
            sub_iter = 0
    return moves


def test_abc_fire_live_mirror_exact_and_crash_on_n3():
    mod = _ref_module("multioptpy.Optimizer.abc_fire")
    eng = mod.ABC_FIRE()
    eng.display_flag = False
    rng = np.random.default_rng(47)
    x = rng.standard_normal((9, 1))
    gs = [rng.standard_normal((9, 1)) for _ in range(7)]
    want = _abc_mirror(gs)
    for g, w in zip(gs, want):
        got = _quiet(eng.run, x, g)
        np.testing.assert_allclose(got, w, atol=1e-14)

    # (N,3) input: even the FIRST call crashes — the end-of-run
    # sub_iter reset (abc_fire.py:66) dots velocity via
    # reshape(1, len(geom)) = (1, N) on a 3N-element array
    eng2 = mod.ABC_FIRE()
    eng2.display_flag = False
    x3 = rng.standard_normal((3, 3))
    g3 = rng.standard_normal((3, 3))
    with pytest.raises(ValueError):
        _quiet(eng2.run, x3, g3)


def test_abc_fire_live_bias_factor_only_on_momentum_term_vs_ours():
    """After a few aligned steps the ref velocity is
    bias*(1-a)*v + a*|v|/|g| g — the bias factor does NOT multiply the
    mixing term. Ours multiplies the whole mix (published form)."""
    mod = _ref_module("multioptpy.Optimizer.abc_fire")
    eng = mod.ABC_FIRE()
    eng.display_flag = False
    x = np.zeros((6, 1))
    g = np.full((6, 1), -0.1)
    _quiet(eng.run, x, g)                      # call 1: v1 = dt1 g
    got2 = np.array(_quiet(eng.run, x, g))    # call 2: aligned
    dt1 = 0.05
    v1 = dt1 * g
    sub_iter = 1
    bias = 1.0 / (1.0 - 0.9 ** sub_iter + 1e-10)
    vel = bias * 0.9 * v1 + 0.1 * (np.linalg.norm(v1)
                                   / np.linalg.norm(g)) * g
    want2 = dt1 * (vel + dt1 * g)
    np.testing.assert_allclose(got2, want2, atol=1e-15)
    # the PUBLISHED form (ours) would give a different step here
    vel_pub = bias * (0.9 * v1 + 0.1 * (np.linalg.norm(v1)
                                        / np.linalg.norm(g)) * g)
    assert not np.allclose(dt1 * (vel_pub + dt1 * g), got2)

    from multioptpy_tpu.steppers.first_order import (abc_fire_step,
                                                     fire_init)
    import jax.numpy as jnp
    st = fire_init(6)
    grad = jnp.asarray(-g[:, 0])               # ours takes the gradient
    mv1, st = abc_fire_step(st, grad)
    mv2, st = abc_fire_step(st, grad)
    # ours: whole-mix bias with k = n_good+1 = 1 on the second call
    # (call 1 was the power=0 reset, so n_good is still 0)
    v1o = 0.05 * g[:, 0]
    k = 1.0
    bias_o = 1.0 / (1.0 - 0.9 ** k)
    vel_o = bias_o * (0.9 * v1o + 0.1 * np.linalg.norm(v1o)
                      * g[:, 0] / np.linalg.norm(g))
    np.testing.assert_allclose(np.asarray(mv2),
                               0.05 * (vel_o + 0.05 * g[:, 0]),
                               atol=1e-12)


# ==========================================================================
# GradientDescent
# ==========================================================================

def test_gradientdescent_live_matches_our_sd():
    mod = _ref_module("multioptpy.Optimizer.gradientdescent")
    eng = mod.GradientDescent()
    rng = np.random.default_rng(48)
    x = rng.standard_normal((3, 3))
    g = rng.standard_normal((3, 3))
    got = _quiet(eng.run, x, g)
    np.testing.assert_allclose(got, g, atol=1e-16)   # DELTA = 1.0

    from multioptpy_tpu.steppers.first_order import sd_step
    import jax.numpy as jnp
    ours = sd_step(jnp.asarray(g.reshape(-1)), delta=1.0)
    # ours returns the DESCENT move (-g); the ref returns +B_g and the
    # driver subtracts — same displacement
    np.testing.assert_allclose(np.asarray(ours), -g.reshape(-1),
                               atol=1e-16)
