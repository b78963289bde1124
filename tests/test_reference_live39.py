"""LIVE parity wave 39: GEDIIS and C2DIIS — the reference's combined
energy/gradient DIIS and its "C-squared" DIIS executed side by side with
our steppers/diis.py gediis_step / c2diis_step.

Conventions learned by execution (ref: Optimizer/gediis.py, c2diis.py):

  * THE C2 ERROR VECTOR IS AN EXACT IDENTITY upstream:
    _compute_c2error (c2diis.py:51-85) builds outer(g_hat, g_hat) @ g =
    g_hat (g_hat . g) = g_hat ||g|| = g — the "squared form" returns the
    gradient unchanged for EVERY input (pinned to 1e-14 below). The
    reference's C2DIIS is therefore quality-weighted plain Pulay DIIS on
    gradients; nothing 'C2' survives execution. Ours implements the
    actual Sellers (IJQC 45 (1993) 31) eigenvector method the file cites.
  * C2DIIS CRASHES ON MOLECULAR GEOMETRY like TRLBFGS (wave 38): run()
    reshapes the (N,3)-shaped extrapolated step into (len(geom), 1) =
    (N, 1) (c2diis.py:438), a ValueError outside any try on the SECOND
    call (min_points=2). It only functions on pre-flattened (3N,1)
    column vectors — which optimizer.py never passes.
  * The coefficient solve (:134-195) is a bordered Pulay system over
    quality-weighted error dot products sqrt(q_i q_j) e_i.e_j with 1e-7
    diagonal regularization (the Lagrange row/col are NOT regularized).
  * Step blending (:434-466): weight = weight_current (+0.05 if
    grad_rms < 0.01, capped 0.8; -0.1 per accumulated failure, floored
    0.1), scaled by a validation quality 0.6*(1-min(1,|log10 ratio|)) +
    0.4*(0.5+0.5*clip(alignment, -0.5, 1)); afterwards
    weight_current <- 0.7 weight_current + 0.3 weight.
  * Stall handling (:400-409): grad_rms not improving by 5% for 3 calls
    cuts weight_current by 0.1 (floor 0.1) and resets the stall counter.
  * GEDIIS (gediis.py:86-200) always RUNS BOTH sub-engines (their
    histories advance even when only one step is used, :115-116), then:
    call 0 (history length 1) takes the pure EDIIS step (iter<5 branch);
    call 1 (length 2 < 3) blends 0.7*EDIIS + 0.3*GDIIS from the
    hardcoded early weights; call >= 2 runs _evaluate_performance's
    success counters (+1/-1 floored at 0, energy trend feeds EDIIS,
    gradient trend feeds GDIIS) with
    w_E = clip(0.3 + 0.4 raw + 0.3 phase, 0.2, 0.8),
    phase = clip((20-iter)/20, 0, 1) — pure EDIIS/GDIIS only outside
    (0.3, 0.7), else the blend. Ours implements the same counter/weight
    algebra branchlessly (steppers/diis.py gediis_step).
  * GEDIIS safety (:165-177): non-finite or ~zero steps fall back to the
    original move; norms above 3x the original are rescaled to 3x.
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
# C2DIIS
# ==========================================================================

def test_c2diis_live_c2error_is_the_gradient():
    eng = _ref_module("multioptpy.Optimizer.c2diis").C2DIIS()
    rng = np.random.default_rng(39)
    for shape in ((6, 1), (9, 1), (12, 1)):
        g = rng.standard_normal(shape)
        np.testing.assert_allclose(eng._compute_c2error(g), g, atol=1e-13)
    # large and tiny norms too (the normalization cancels exactly)
    g = rng.standard_normal((6, 1)) * 1e6
    np.testing.assert_allclose(eng._compute_c2error(g), g, rtol=1e-12)


def test_c2diis_live_crashes_on_molecular_geometry():
    eng = _ref_module("multioptpy.Optimizer.c2diis").C2DIIS()
    a9 = np.diag(np.linspace(0.5, 2.0, 9))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 3))

    def grad(xx):
        return (a9 @ xx.reshape(-1)).reshape(3, 3)

    with contextlib.redirect_stdout(io.StringIO()):
        g = grad(x)
        eng.run(x, g, 0 * g, -0.1 * g)      # history 1 < min_points: OK
        x2 = x - 0.05 * g
        g2 = grad(x2)
        with pytest.raises(ValueError):     # reshape(size 9 -> (3,1))
            eng.run(x2, g2, g, -0.1 * g2)


def test_c2diis_live_coefficients_are_weighted_bordered_solve():
    mod = _ref_module("multioptpy.Optimizer.c2diis")
    eng = mod.C2DIIS()
    rng = np.random.default_rng(7)
    grads = [rng.standard_normal((6, 1)) for _ in range(3)]
    quals = [1.0, 0.6, 0.9]
    for g, q in zip(grads, quals):
        eng.geom_history.append(rng.standard_normal((6, 1)))
        eng.grad_history.append(g)
        eng.c2error_history.append(eng._compute_c2error(g))
        eng.quality_history.append(q)
    c = _quiet(eng._solve_c2diis_equations)

    # replica: quality-weighted Pulay bordered system on plain gradients
    # (the c2 errors ARE the gradients)
    n = 3
    b = np.zeros((n + 1, n + 1))
    for i in range(n):
        for j in range(n):
            b[i, j] = np.sqrt(quals[i] * quals[j]) * float(
                grads[i].flatten() @ grads[j].flatten())
    b[np.diag_indices(n)] += 1e-7
    b[n, :n] = 1.0
    b[:n, n] = 1.0
    rhs = np.zeros(n + 1)
    rhs[n] = 1.0
    np.testing.assert_allclose(c, np.linalg.solve(b, rhs)[:n], atol=1e-12)


def test_c2diis_live_column_vector_run_blend_replica():
    """Second run() call on (3N,1) columns: replicate the full blend —
    coefficients, validation quality, adaptive weight, and the
    weight_current EMA — and match the returned move exactly."""
    mod = _ref_module("multioptpy.Optimizer.c2diis")
    eng = mod.C2DIIS()
    a6 = np.diag(np.linspace(0.5, 2.0, 6))
    x1 = np.array([[0.4], [-0.3], [0.5], [0.2], [-0.6], [0.3]])
    g1 = (a6 @ x1.reshape(-1)).reshape(6, 1) * 1e-3   # rms < 0.01
    o1 = -0.1 * g1
    mv1 = np.asarray(_quiet(eng.run, x1, g1, 0 * g1, o1))
    np.testing.assert_allclose(mv1, o1, atol=1e-15)   # history-building

    x2 = x1 - mv1
    g2 = (a6 @ x2.reshape(-1)).reshape(6, 1) * 1e-3
    o2 = -0.1 * g2
    mv2 = np.asarray(_quiet(eng.run, x2, g2, g1, o2))

    # replica of call 2
    q2 = 1.0 if np.linalg.norm(g2) / np.linalg.norm(g1) < 1.0 else max(
        0.3, 1.0 / (1.0 + np.log(np.linalg.norm(g2) / np.linalg.norm(g1))))
    n = 2
    grads = [g1, g2]
    quals = [1.0, q2]
    b = np.zeros((n + 1, n + 1))
    for i in range(n):
        for j in range(n):
            b[i, j] = np.sqrt(quals[i] * quals[j]) * float(
                grads[i].flatten() @ grads[j].flatten())
    b[np.diag_indices(n)] += 1e-7
    b[n, :n] = 1.0
    b[:n, n] = 1.0
    rhs = np.zeros(n + 1)
    rhs[n] = 1.0
    c = np.linalg.solve(b, rhs)[:n]
    assert np.all(c > -0.5) and np.all(c < 1.5)       # no filtering fired
    geom_ext = c[0] * x1 + c[1] * x2
    step = (geom_ext - x2).reshape(6, 1)

    ratio = np.linalg.norm(step) / np.linalg.norm(o2)
    rq = 1.0 - min(1.0, abs(np.log10(ratio)))
    align = float(step.flatten() @ (-g2 / np.linalg.norm(g2)).flatten()
                  ) / np.linalg.norm(step)
    aq = 0.5 + 0.5 * max(-0.5, min(1.0, align))
    vq = 0.6 * rq + 0.4 * aq
    assert vq >= 0.2
    w = min(0.8, 0.2 + 0.05) * vq        # grad_rms < 0.01 branch
    np.testing.assert_allclose(mv2, (1 - w) * o2 + w * step, atol=1e-13)
    assert eng.c2diis_weight_current == pytest.approx(0.7 * 0.2 + 0.3 * w)


def test_c2diis_live_stall_cuts_weight():
    """Three non-improving calls cut weight_current by 0.1 (floor 0.1)."""
    mod = _ref_module("multioptpy.Optimizer.c2diis")
    eng = mod.C2DIIS()
    g = np.full((6, 1), 0.05)
    x = np.zeros((6, 1))
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(4):     # constant rms: never improves by 5%
            eng.run(x, g, g, -0.1 * g)
    # call 1 improves vs inf; calls 2-4 stall -> one cut at the 3rd stall
    assert eng.c2diis_weight_current <= 0.2 - 0.1 + 1e-12 + 0.3  # cut fired
    assert eng.non_improving_count < 3


# ==========================================================================
# GEDIIS
# ==========================================================================

def _drive_gediis(n_calls):
    """Drive GEDIIS and fresh GDIIS/EDIIS twins on an identical scripted
    sequence; return (gediis_moves, gdiis_moves, ediis_moves, inputs)."""
    og = _ref_module("multioptpy.Optimizer.gediis")
    ogd = _ref_module("multioptpy.Optimizer.gdiis")
    oed = _ref_module("multioptpy.Optimizer.ediis")
    eng = og.GEDIIS()
    twin_g = ogd.GDIIS()
    twin_e = oed.EDIIS()

    a6 = np.diag(np.linspace(0.5, 2.0, 6))
    x = np.array([[0.8], [-0.5], [0.7], [0.4], [-0.9], [0.6]])
    outs, gouts, eouts, inputs = [], [], [], []
    prev_g = np.zeros_like(x)
    with contextlib.redirect_stdout(io.StringIO()):
        for it in range(n_calls):
            g = (a6 @ x.reshape(-1)).reshape(6, 1) * 0.05
            e = float(0.5 * x.reshape(-1) @ a6 @ x.reshape(-1))
            orig = -0.5 * g
            outs.append(np.asarray(eng.run(x, e, g, prev_g, orig)))
            gouts.append(np.asarray(twin_g.run(x, g, prev_g, orig)))
            eouts.append(np.asarray(twin_e.run(x, e, g, orig)))
            inputs.append((x.copy(), e, g.copy(), orig.copy()))
            prev_g = g
            x = x - outs[-1]
    return outs, gouts, eouts, inputs


def test_gediis_live_call0_pure_ediis_call1_hardcoded_blend():
    outs, gouts, eouts, _ = _drive_gediis(2)
    # call 0: len(history)==1 -> iter<5 -> pure EDIIS
    np.testing.assert_allclose(outs[0], eouts[0], atol=1e-13)
    # call 1: len==2 (<3) -> hardcoded early weights 0.7/0.3 -> blended
    want = 0.7 * eouts[1] + 0.3 * gouts[1]
    np.testing.assert_allclose(outs[1], want, atol=1e-13)


def test_gediis_live_counter_weight_algebra():
    """Calls >= 2: replicate _evaluate_performance's success counters, the
    clip(0.3 + 0.4 raw + 0.3 phase) weight, the 3x safety cap, and the
    oscillation rewrite (which, notably, BYPASSES the cap: the recomputed
    max(0.7, w_E) blend is returned uncapped, gediis.py:179-198) against
    the executed engine."""
    n = 6
    outs, gouts, eouts, inputs = _drive_gediis(n)
    es = [inp[1] for inp in inputs]
    rms = [np.sqrt(np.mean(inp[2] ** 2)) for inp in inputs]

    e_cnt = g_cnt = 0
    for it in range(2, n):
        # counters use history INCLUDING the current call's append
        if es[it] < es[it - 1]:
            e_cnt += 1
        else:
            e_cnt = max(0, e_cnt - 1)
        if rms[it] < rms[it - 1]:
            g_cnt += 1
        else:
            g_cnt = max(0, g_cnt - 1)
        raw = e_cnt / (e_cnt + g_cnt + 1)
        phase = max(0.0, min(1.0, (20 - it) / 20))
        w_e = max(0.2, min(0.8, 0.3 + raw * 0.4 + phase * 0.3))
        if w_e > 0.7:
            want = eouts[it]
        elif (1 - w_e) > 0.7:
            want = gouts[it]
        else:
            want = w_e * eouts[it] + (1 - w_e) * gouts[it]
        # final safety: cap at 3x the original step norm
        orig = inputs[it][3]
        nw, no = np.linalg.norm(want), np.linalg.norm(orig)
        if nw > 3.0 * no > 0:
            want = want * (3.0 * no / nw)
        # oscillation rewrite (uncapped) over the last 4 recorded energies
        if it >= 3:
            diffs = np.diff(es[it - 3:it + 1])
            if np.all(np.abs(diffs) > 0):
                signs = np.sign(diffs)
                if np.sum(np.abs(np.diff(signs))) >= 2:
                    w_osc = max(0.7, w_e)
                    want = w_osc * eouts[it] + (1 - w_osc) * gouts[it]
        np.testing.assert_allclose(outs[it], want, atol=1e-12,
                                   err_msg=f"call {it}")


def test_gediis_live_weight_formula_matches_ours():
    """Our branchless weight (steppers/diis.py gediis_step docstring
    formula) is numerically the reference's _evaluate_performance for the
    same counters and iteration."""
    og = _ref_module("multioptpy.Optimizer.gediis")
    eng = og.GEDIIS()
    for it, e_cnt, g_cnt, e_hist in [
            (3, 2, 0, [3.0, 2.0, 1.0]),
            (12, 1, 4, [3.0, 2.5, 2.0]),
            (25, 0, 6, [1.0, 0.9, 0.8])]:
        eng.iter = it
        eng.ediis_success_count = e_cnt
        eng.gdiis_success_count = g_cnt
        # energy/grad trends chosen improving: counters +1 inside
        eng.energy_history = list(e_hist)
        eng.grad_rms_history = [0.3, 0.2, 0.1]
        with contextlib.redirect_stdout(io.StringIO()):
            w_e, w_g = eng._evaluate_performance()
        raw = (e_cnt + 1) / ((e_cnt + 1) + (g_cnt + 1) + 1)
        phase = max(0.0, min(1.0, (20 - it) / 20))
        want = max(0.2, min(0.8, 0.3 + raw * 0.4 + phase * 0.3))
        assert w_e == pytest.approx(want, abs=1e-12)
        assert w_g == pytest.approx(1 - want, abs=1e-12)
