"""LIVE parity wave 35: the adaptive step-enhancement trio — LineSearch,
ComponentWiseScaling, CoordinateLocking — the reference's stateful
enhancement classes executed through scripted driver sequences, side by
side with our steppers/enhancements.py functional counterparts.

Conventions learned by execution (ref: Optimizer/linesearch.py,
component_wise_scaling.py, coordinate_locking.py; call-shape contract
optimizer.py:740-757 — the driver reshapes geometry/gradients/moves to
COLUMN vectors (3N, 1) before any enhancement sees them; the per-atom
(N, 3) shape would not broadcast):

  * LineSearch (:14-235) is a stateful EXTRAPOLATION search returning
    INCREMENTAL steps across driver iterations:
      - start: total alpha_0 = clip(min(1, maxstep/max|p|) * damping,
        1e-8, 5) = 0.8 on a |p|_max = 0.05 direction -> returns 0.8 p;
      - energy decreased but gradient not yet orthogonal to p
        (|cos| >= 0.05): extrapolate x1.5 -> returns 0.4 p;
      - energy then increased: terminate, BACKTRACK to the best total
        alpha -> returns -0.4 p; a first continuation that already
        increased retreats the full -0.8 p (accepted alpha 0);
      - orthogonality met after a decrease: terminate with a ZERO
        incremental step (current point accepted).
    Ours is a branchless fixed-trial Armijo backtrack
    (enhancements.py:18 backtracking_linesearch) — single-call, no
    cross-iteration state; pinned to pick the largest passing alpha.
  * ComponentWiseScaling (:12-404, 'adaptive' default): first-call
    factors = 0.8 * 1 + 0.2 * clip((|g|/mean|g|)^-0.5, 0.01, 5) (the
    gradient-based EMA, :88-120; the history strategy is inactive
    until enough history) and the returned step is EXACTLY
    0.9 * factors * move (global damping 0.9, :307-331) — pinned
    against a replica. Larger-gradient coordinates get SMALLER factors
    (inverse-power scaling).
  * CoordinateLocking (:12-404, 'adaptive' default): after a few
    iterations it locks low-|g|,low-|move| coordinates; the output
    zeroes locked components and passes unlocked ones through
    UNCHANGED — pinned; our coordinate_locking(move, mask) reproduces
    the application exactly given the same mask.

Ref anchors: Optimizer/linesearch.py:14-235,
component_wise_scaling.py:12-135/:307-404, coordinate_locking.py:12-404,
optimizer.py:645-707 (enhancement chain), :740-757 (column reshape);
ours: steppers/enhancements.py:18-97.
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


def test_linesearch_extrapolation_sequence_live():
    ls_mod = _ref_module("multioptpy.Optimizer.linesearch")

    rng = np.random.default_rng(36)
    geom0 = rng.normal(size=(9, 1))
    p = np.zeros((9, 1))
    p[0, 0] = 0.05             # max component 0.05 -> scale 4 -> alpha 0.8
    g0 = np.zeros((9, 1))
    g0[0, 0] = -1.0

    ls = ls_mod.LineSearch()
    with contextlib.redirect_stdout(io.StringIO()):
        s1 = ls.run(geom0, g0, g0, -1.0, -1.0, p)
    assert np.allclose(s1, 0.8 * p)
    assert ls.active_search is True

    # decrease + not orthogonal -> extrapolate to 1.2 (incremental 0.4 p)
    g1 = np.zeros((9, 1))
    g1[0, 0] = -0.5
    with contextlib.redirect_stdout(io.StringIO()):
        s2 = ls.run(geom0 + s1, g1, g0, -1.4, -1.0, p)
    assert np.allclose(s2, 0.4 * p)

    # increase -> terminate, backtrack to the best point (alpha 0.8)
    with contextlib.redirect_stdout(io.StringIO()):
        s3 = ls.run(geom0 + s1 + s2, g1, g1, -1.2, -1.4, p)
    assert np.allclose(s3, -0.4 * p)
    assert ls.active_search is False

    # immediate increase -> full retreat to alpha 0
    ls2 = ls_mod.LineSearch()
    with contextlib.redirect_stdout(io.StringIO()):
        t1 = ls2.run(geom0, g0, g0, -1.0, -1.0, p)
        t2 = ls2.run(geom0 + t1, g0, g0, -0.5, -1.0, p)
    assert np.allclose(t2, -0.8 * p)

    # orthogonality met after a decrease -> accept in place (zero step)
    ls3 = ls_mod.LineSearch()
    g_perp = np.zeros((9, 1))
    g_perp[1, 0] = 1.0
    with contextlib.redirect_stdout(io.StringIO()):
        u1 = ls3.run(geom0, g0, g0, -1.0, -1.0, p)
        u2 = ls3.run(geom0 + u1, g_perp, g0, -1.3, -1.0, p)
    assert np.allclose(u2, 0.0)
    assert ls3.active_search is False


def test_linesearch_ours_armijo_counterpart():
    import jax.numpy as jnp
    from multioptpy_tpu.steppers.enhancements import backtracking_linesearch

    x_min = jnp.asarray(np.full((2, 3), 0.3))

    def energy_fn(c):
        return 0.5 * jnp.sum((c - x_min) ** 2)

    coords = jnp.zeros((2, 3), dtype=jnp.float64)
    g0 = (coords - x_min).reshape(-1)
    move = -(coords - x_min)  # exact Newton step: alpha = 1 passes Armijo
    out = backtracking_linesearch(energy_fn, coords, move,
                                  float(energy_fn(coords)), g0)
    assert np.allclose(np.asarray(out), np.asarray(move))
    # an overshooting move backtracks to a passing fraction
    out2 = backtracking_linesearch(energy_fn, coords, 4.0 * move,
                                   float(energy_fn(coords)),
                                   g0)
    assert np.linalg.norm(np.asarray(out2)) < np.linalg.norm(4 * move)


def test_componentwise_scaling_factors_live():
    cws_mod = _ref_module("multioptpy.Optimizer.component_wise_scaling")
    from multioptpy_tpu.steppers.enhancements import componentwise_scaling

    cws = cws_mod.ComponentWiseScaling()
    rng = np.random.default_rng(350)
    geom = rng.normal(size=(9, 1))
    grad = rng.normal(size=(9, 1))
    move = rng.normal(size=(9, 1)) * 0.1
    with contextlib.redirect_stdout(io.StringIO()):
        out = cws.run(geom, -1.0, grad, move)
    assert out.shape == (9, 1)

    # replica: EMA of the inverse-power normalized-gradient factors
    ga = np.maximum(np.abs(grad.flatten()), 1e-10)
    sf = np.clip((ga / ga.mean()) ** -0.5, 0.01, 5.0)
    factors = 0.8 * np.ones(9) + 0.2 * sf
    assert np.allclose(cws.scaling_factors, factors, atol=1e-12)
    assert np.allclose(out, 0.9 * factors.reshape(-1, 1) * move, atol=1e-14)
    # larger |g| -> smaller factor (inverse relationship), executed
    hi, lo = np.argmax(ga), np.argmin(ga)
    assert cws.scaling_factors[hi] < cws.scaling_factors[lo]

    # ours is a per-component CLAMP, not a rescale — different tool,
    # same "tame individual components" intent
    import jax.numpy as jnp
    clamped = componentwise_scaling(jnp.asarray(move.flatten()), 0.05)
    assert np.all(np.abs(np.asarray(clamped)) <= 0.05 + 1e-15)


def test_coordinate_locking_application_live():
    cl_mod = _ref_module("multioptpy.Optimizer.coordinate_locking")
    from multioptpy_tpu.steppers.enhancements import coordinate_locking

    cl = cl_mod.CoordinateLocking()
    rng = np.random.default_rng(351)
    geom = rng.normal(size=(9, 1))
    grad = rng.normal(size=(9, 1))
    grad[3, 0] = 1e-9           # a near-dead coordinate to lock
    move = rng.normal(size=(9, 1)) * 0.1
    with contextlib.redirect_stdout(io.StringIO()):
        out = cl.run(geom, -1.0, grad, move)
        for _ in range(5):
            out = cl.run(geom, -1.0, grad, move)
    mask = cl.lock_mask.astype(bool)
    assert mask.sum() >= 1
    assert np.allclose(out.flatten()[mask], 0.0)
    assert np.allclose(out.flatten()[~mask], move.flatten()[~mask])

    # ours applies the same masking semantics
    import jax.numpy as jnp
    ours = coordinate_locking(jnp.asarray(move.flatten()),
                              jnp.asarray(cl.lock_mask, dtype=jnp.float64))
    assert np.allclose(np.asarray(ours), out.flatten(), atol=1e-15)
