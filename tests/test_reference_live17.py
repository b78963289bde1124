"""LIVE parity wave 17: the dimer TS-search engine (OtherMethod/dimer.py)
— the reference's rotation/translation code executed on a shared analytic
quadratic PES, side by side with our iEIP dimer engine.

Conventions learned by execution (ref: OtherMethod/dimer.py):

  * GRADIENT-AS-FORCE SIGN DEFECT upstream: dimer_rotate/translate and
    run() feed the backend's single_point return — a GRADIENT for every
    Calculation engine (e.g. tblite_calculation_tools.py:162) — into
    variables named `forces*` with NO negation (dimer.py:200-236,
    :747-756). Executed consequences, pinned on a known quadratic
    H = diag(-1, .5, 1, 1.5, 2, 2.5):
      - the QuickMin rotation converges the axis into the HIGHEST
        -curvature subspace (overlap with the true lowest mode ~ 1e-4),
      - the returned "curvature" equals MINUS the Rayleigh quotient
        v.Hv of the axis it found,
      - feeding the SAME code a true force engine (returning -g) makes
        it converge to the LOWEST mode with the correct-sign curvature
        -1 — the rotation algebra is sound, the input sign is not.
    Our drivers/ieip.py _dimer uses gradient differences directly
    (curv = (g1-g0).v/dr, f_rot = -perp(g1-g0)) and walks to the saddle
    along the true lowest mode — verified on the same quadratic.
  * dimer_translate with curvature < 0 moves one full max_step along the
    normalized Polak-Ribiere CG direction of (forces - 2 f_par), first
    step = the raw modified force direction — pinned exactly.
  * rotate_vector_around_axis (dimer.py:99) implements Rodrigues on the
    FLATTENED 3N vector with np.cross — correct for a single atom (3
    dof), raises ValueError for any multi-atom system; the default
    QuickMin rotation path never calls it, which is why the engine still
    runs (pinned).
  * parallel/perpendicular/normalize helpers are the standard flat-vector
    projections — pinned exactly.

Ref anchors: OtherMethod/dimer.py:68-143 (helpers), :163-503 (rotate),
:504-588 (translate), :710-860 (run); ieip.py:326-331 (engine wiring).
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


def _empty_force_data():
    iface = _ref_module("multioptpy.interface")
    p = iface.init_parser()
    p = iface.call_optimizeparser(p)
    p = iface.parser_for_biasforce(p)
    return iface.force_data_parser(p.parse_args(["dummy.xyz"]))


_H = np.diag([-1.0, 0.5, 1.0, 1.5, 2.0, 2.5])


class _QuadEngine:
    """single_point returning the GRADIENT of 0.5 x.Hx (the standard
    Calculation-engine contract); sign=-1 turns it into a force engine."""

    def __init__(self, sign=1.0):
        self.sign = sign

    def single_point(self, d, el, it, cm, me, coords):
        x = np.asarray(coords).reshape(-1)
        g = (_H @ x).reshape(-1, 3)
        return float(0.5 * x @ _H @ x), self.sign * g, np.asarray(coords), \
            False


def _make_dimer(tmp_path):
    dim = _ref_module("multioptpy.OtherMethod.dimer")

    class _Cfg:
        pass

    cfg = _Cfg()
    cfg.iEIP_FOLDER_DIRECTORY = str(tmp_path) + "/"
    cfg.force_data = _empty_force_data()
    os.makedirs(cfg.iEIP_FOLDER_DIRECTORY, exist_ok=True)
    return dim.DimerMethod(cfg)


def _rotate(dm, engine, coords, axis, n_calls=3):
    """Call dimer_rotate as run() does — repeatedly, feeding the axis
    back — so the QuickMin rotation converges on the stationary mode."""
    for _ in range(n_calls):
        with contextlib.redirect_stdout(io.StringIO()):
            new_axis, curv, fail = dm.dimer_rotate(
                engine, coords, axis, ["H", "H"], [0, 1], None)
        assert not fail
        axis = np.asarray(new_axis).reshape(coords.shape)
    return np.asarray(new_axis).reshape(-1), float(curv)


# ==========================================================================
# helpers
# ==========================================================================

def test_dimer_vector_helpers_live_exact(tmp_path):
    dm = _make_dimer(tmp_path)
    rng = np.random.default_rng(170)
    v = rng.standard_normal((2, 3))
    b = rng.standard_normal((2, 3))
    np.testing.assert_allclose(dm.normalize(v),
                               v / np.linalg.norm(v), atol=1e-15)
    vf, bf = v.reshape(-1), b.reshape(-1)
    bu = bf / np.linalg.norm(bf)
    par = (np.dot(vf, bu) * bu).reshape(2, 3)
    np.testing.assert_allclose(dm.parallel_vector(v, b), par, atol=1e-15)
    np.testing.assert_allclose(dm.perpendicular_vector(v, b), v - par,
                               atol=1e-15)


def test_rodrigues_helper_is_3d_only_live(tmp_path):
    """rotate_vector_around_axis works for one atom (3 dof) but raises on
    flattened multi-atom vectors (np.cross needs dim 2 or 3) — upstream
    limitation, unexercised by the default QuickMin rotation path."""
    dm = _make_dimer(tmp_path)
    v3 = np.array([[1.0, 0.0, 0.0]])
    k3 = np.array([[0.0, 0.0, 1.0]])
    out = dm.rotate_vector_around_axis(v3, k3, np.pi / 2)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-12)
    with pytest.raises(ValueError):
        dm.rotate_vector_around_axis(np.ones((2, 3)), np.ones((2, 3)), 0.3)


# ==========================================================================
# rotation: the gradient-as-force sign defect
# ==========================================================================

def test_dimer_rotate_live_gradient_engine_quirk(tmp_path):
    """With the standard gradient-returning engine the rotation converges
    to the HIGHEST modes and reports curvature = -v.Hv."""
    dm = _make_dimer(tmp_path)
    rng = np.random.default_rng(171)
    coords = (0.3 * rng.standard_normal(6)).reshape(2, 3)
    axis = rng.standard_normal(6).reshape(2, 3)

    v, curv = _rotate(dm, _QuadEngine(sign=+1.0), coords, axis)
    rq = float(v @ _H @ v)
    # curvature is MINUS the Rayleigh quotient of the axis it found
    np.testing.assert_allclose(curv, -rq, atol=2e-3)
    # the axis ended up in the top-curvature subspace, not the lowest mode
    assert abs(v[0]) < 0.01           # true lowest mode is e0
    assert v[4] ** 2 + v[5] ** 2 > 0.95
    assert rq > 1.5


def test_dimer_rotate_live_force_engine_correct(tmp_path):
    """The SAME reference code with a true force engine (-g) converges to
    the lowest mode with the correct-sign curvature -1: the defect is the
    input sign convention, not the rotation algebra."""
    dm = _make_dimer(tmp_path)
    rng = np.random.default_rng(172)
    coords = (0.3 * rng.standard_normal(6)).reshape(2, 3)
    axis = rng.standard_normal(6).reshape(2, 3)

    v, curv = _rotate(dm, _QuadEngine(sign=-1.0), coords, axis)
    assert abs(v[0]) > 0.999
    np.testing.assert_allclose(curv, -1.0, atol=2e-3)


# ==========================================================================
# translation formula
# ==========================================================================

def test_dimer_translate_live_first_step_formula(tmp_path):
    """First translate call: new = x + max_step * unit(f - 2 f_par) for
    curvature < 0 (the CG direction equals the raw modified force on the
    first call) — pinned exactly against the engine's own outputs."""
    dm = _make_dimer(tmp_path)
    rng = np.random.default_rng(173)
    coords = (0.3 * rng.standard_normal(6)).reshape(2, 3)
    axis = np.zeros(6)
    axis[0] = 1.0
    axis = axis.reshape(2, 3)

    engine = _QuadEngine(sign=+1.0)
    with contextlib.redirect_stdout(io.StringIO()):
        new_coords, new_e, fail = dm.dimer_translate(
            engine, coords.copy(), axis, -1.0, ["H", "H"], [0, 1], None)
    assert not fail
    g = (_H @ coords.reshape(-1)).reshape(2, 3)
    f_par = (np.sum(g.reshape(-1) * axis.reshape(-1))
             * axis.reshape(-1)).reshape(2, 3)
    modified = g - 2.0 * f_par
    expect = coords + 0.1 * modified / np.linalg.norm(modified)
    np.testing.assert_allclose(np.asarray(new_coords), expect, atol=1e-12)
    # returned energy is evaluated AT the new point
    np.testing.assert_allclose(
        new_e, 0.5 * expect.reshape(-1) @ _H @ expect.reshape(-1),
        atol=1e-12)


# ==========================================================================
# ours: correct lowest-mode walk on the same quadratic
# ==========================================================================

def test_our_dimer_converges_to_saddle_on_shared_quadratic():
    from multioptpy_tpu.drivers.ieip import IEIPConfig, _dimer

    def energy_grad(x):
        flat = x.reshape(-1)
        h = jnp.asarray(_H)
        return 0.5 * flat @ h @ flat, (h @ flat).reshape(x.shape)

    rng = np.random.default_rng(174)
    x0 = jnp.asarray((0.3 * rng.standard_normal(6)).reshape(2, 3))
    v0 = rng.standard_normal(6)
    v0 /= np.linalg.norm(v0)
    cfg = IEIPConfig(engine="dimer", n_steps=400, step_size=0.05,
                     fmax=1e-6)
    res = _dimer(energy_grad, x0, jnp.asarray(v0.reshape(2, 3)), cfg)
    assert res.converged
    # saddle of the pure quadratic is the origin
    assert np.max(np.abs(np.asarray(res.ts_guess))) < 1e-4
    # final dimer axis (image_b - ts)/dr is the TRUE lowest mode e0
    v_fin = np.array(res.image_b - res.ts_guess).reshape(-1)
    v_fin /= np.linalg.norm(v_fin)
    assert abs(v_fin[0]) > 0.999
