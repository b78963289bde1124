"""LIVE parity wave 10: TRIM (trust-region image minimization) and the
Perturbation enhancement, executed through the ACTUAL reference code side
by side with ours.

Conventions learned by execution:

  * TRIM (trim.py:106-201): zetas = -g~/(lambda~ - mu) in the eigenbasis
    with the image flip applied to BOTH the eigenvalues and the gradient
    components of the followed roots, and the step returned in that
    flipped form (no sign un-flip — trim.py:195). Our mu convention is
    mirrored (-g~/(lambda~ + mu)), so mu_ours == -mu_ref and the steps
    coincide. Within the trust radius the reference takes the pure
    Newton step (mu=0); ours uses mu = max(0, -lambda_min) + 1e-8,
    identical for positive-definite image spectra to O(1e-7).
  * On the trust boundary the reference finds mu by scipy.optimize.newton
    from mu=0 and ours by bisection on the mu >= -lambda_min branch —
    same secular equation, same boundary step.
  * Perturbation (purtubation.py:11, the reference's own comment: "just
    for fun... no scientific basis"): a Gaussian kick with scale
    DELTA * sqrt(2 * damping * kB * T), kB = 3.16681e-6 Eh/K —
    reproduced exactly under a seeded numpy RNG.

Ref anchors: Optimizer/trim.py:106-201, Optimizer/purtubation.py:3-16.
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


def _spd_fixture(dim=9, grad_scale=1e-2, seed=47):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    w = np.linspace(0.05, 1.5, dim)
    h = (q * w) @ q.T
    h = 0.5 * (h + h.T)
    g = rng.normal(scale=grad_scale, size=dim)
    return g, h


@pytest.mark.parametrize("grad_scale,branch", [(5e-3, "newton"),
                                               (0.3, "boundary")])
def test_trim_step_live(grad_scale, branch):
    trim_mod = _ref_module("multioptpy.Optimizer.trim")
    from multioptpy_tpu.steppers.enhancements import trim_step

    g, h = _spd_fixture(grad_scale=grad_scale)
    w, v = np.linalg.eigh(h)

    ref = trim_mod.TRIM(saddle_order=0)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_step = np.asarray(ref.get_step(-g.copy(), h.copy(),
                                           w.copy(), v.copy())).flatten()

    ours = np.asarray(trim_step(jnp.asarray(g), jnp.asarray(h),
                                trust_radius=ref.trust_radius,
                                saddle_order=0))

    if branch == "newton":
        assert np.linalg.norm(ref_step) < ref.trust_radius
        # pure Newton step on both sides
        newton = -np.linalg.solve(h, g)
        assert np.allclose(ref_step, newton, atol=1e-10)
        assert np.allclose(ours, newton, atol=1e-5)
    else:
        # both land on the trust boundary with the same level-shifted step
        assert np.linalg.norm(ref_step) == pytest.approx(ref.trust_radius,
                                                         rel=1e-4)
        assert np.linalg.norm(ours) == pytest.approx(ref.trust_radius,
                                                     rel=1e-3)
        cos = float(ref_step @ ours
                    / (np.linalg.norm(ref_step) * np.linalg.norm(ours)))
        assert cos > 0.9999, f"boundary TRIM steps diverge: cos={cos}"


def test_trim_image_flip_live():
    """saddle_order=1 on an indefinite Hessian: the reference flips the
    lowest root's eigenvalue AND gradient component and keeps the step in
    flipped form; ours must match."""
    trim_mod = _ref_module("multioptpy.Optimizer.trim")
    from multioptpy_tpu.steppers.enhancements import trim_step

    g, h = _spd_fixture(grad_scale=5e-3, seed=53)
    w, v = np.linalg.eigh(h)
    h_ts = h - 2.0 * w[0] * np.outer(v[:, 0], v[:, 0])   # one negative mode
    w2, v2 = np.linalg.eigh(h_ts)
    assert w2[0] < 0

    ref = trim_mod.TRIM(saddle_order=1)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_step = np.asarray(ref.get_step(-g.copy(), h_ts.copy(),
                                           w2.copy(), v2.copy())).flatten()
    ours = np.asarray(trim_step(jnp.asarray(g), jnp.asarray(h_ts),
                                trust_radius=ref.trust_radius,
                                saddle_order=1))
    # trim_step sorts modes by eigh order == ascending, matching ref's
    # argsort choice of the lowest root
    if np.linalg.norm(ref_step) < ref.trust_radius:
        assert np.allclose(ref_step, ours, atol=1e-5), (
            f"ref {ref_step[:3]} ours {ours[:3]}")
    else:
        cos = float(ref_step @ ours
                    / (np.linalg.norm(ref_step) * np.linalg.norm(ours)))
        assert cos > 0.999
    # the step ASCENDS along the flipped mode
    g_ts = float(v2[:, 0] @ g)
    assert float(v2[:, 0] @ ours) * g_ts > 0.0


def test_perturbation_scale_live():
    pert_mod = _ref_module("multioptpy.Optimizer.purtubation")

    t = 300.0
    ref = pert_mod.Perturbation(temperature=t)
    np.random.seed(1234)
    out = np.asarray(ref.boltzmann_dist_perturb(np.zeros((6, 1)))).flatten()

    np.random.seed(1234)
    draws = np.random.normal(loc=0.0, scale=1.0, size=6)
    kb = 3.16681e-6
    scale = 0.06 * np.sqrt(2.0 * 10.0 * kb * t)
    assert np.allclose(out, scale * draws, atol=1e-15)


def test_trim_method_string_drives_optimization():
    """'trim' in a quasi-Newton method name activates the TRIM replacement
    (ref: optimizer.py:384): rsirfo_fsb_trim parses, runs, and converges to
    the same SQM2 water minimum as the plain method."""
    import jax

    from multioptpy_tpu.calculators.sqm import SQM2
    from multioptpy_tpu.drivers.optimize import (OptimizeConfig,
                                                 _parse_method, optimize)

    assert _parse_method("rsirfo_fsb_trim") == ("rfo", "fsb")
    assert _parse_method("rsprfo_bofill_trim") == ("prfo", "bofill")

    xw = jnp.asarray([[0.0, 0.0, 0.30], [0.0, 1.55, -0.99],
                      [0.0, -1.49, -0.85]])
    zw = jnp.asarray([8, 1, 1])
    res = optimize(SQM2(), xw, zw,
                   config=OptimizeConfig(method="rsirfo_fsb_trim",
                                         nsteps=80))
    assert bool(res.converged)
    res_plain = optimize(SQM2(), xw, zw,
                         config=OptimizeConfig(method="rsirfo_fsb",
                                               nsteps=80))
    assert float(res.energy) == pytest.approx(float(res_plain.energy),
                                              abs=1e-8)
