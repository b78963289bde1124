"""LIVE parity wave 54: the CalculateMoveVector orchestration layer
(optimizer.py) executed end to end with real engines — the
method-switching sigmoid, the subtract-and-convert geometry update, and
the registry fallback — side by side with our drivers/optimize.py
_parse_method switching.

Conventions learned by execution (ref: optimizer.py:259-822):

  * calc_move_vector reshapes everything to (3N,1) columns internally,
    applies the step as new_geometry = (geom - move) and returns it in
    ANGSTROM while the inputs are Bohr (:800-815) — callers must
    convert back every iteration.
  * With two methods the step is sigmoid-switched on the RMS force
    (:582-617): above 0.05 the FIRST method's move is returned
    verbatim, below 0.005 the SECOND's, in between the blend
    f mv0 + (1-f) mv1 with f = 1/(1+exp(-10 (x-0.5))),
    x = (rms-0.005)/0.045 (pinned to 1e-12 by recovering the blended
    move from three otherwise identical runs). Our _parse_method
    implements the same normalized-sigmoid switching.
  * The final move is clamped GLOBALLY to the trust radius (0.5
    default for minimization) after switching.
  * initialization() (:310-512) silently substitutes FIRE for unknown
    method names (pinned) — consistent with the ApproxHessian
    dispatcher's silent lindh2007d3 fallback (wave 42).
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

B2A = 0.52917721067


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


def _run_cmv(mod, methods, geom, b_g):
    cmv = _quiet(mod.CalculateMoveVector, DELTA=1.0,
                 element_list=["H"] * len(geom))
    insts = _quiet(cmv.initialization, methods)
    zeros = np.zeros_like(geom)
    new_geom, move, _ = _quiet(
        cmv.calc_move_vector, 0, geom.copy(), b_g.copy(), zeros.copy(),
        geom.copy(), 0.0, 0.0, zeros.copy(), geom.copy(), b_g.copy(),
        zeros.copy(), insts)
    return np.asarray(new_geom), np.asarray(move)


def _recover_move(geom, new_geom_ang):
    return geom - new_geom_ang / B2A


def test_cmv_live_subtract_convention_and_unit_conversion():
    mod = _ref_module("multioptpy.optimizer")
    rng = np.random.default_rng(120)
    geom = rng.standard_normal((3, 3))
    b_g = 0.01 * rng.standard_normal((3, 3))
    new_geom, move = _run_cmv(mod, ["fire"], geom, b_g)
    # output is Angstrom: subtracting the returned Bohr move from the
    # Bohr input and converting reproduces it exactly
    np.testing.assert_allclose(new_geom, (geom - move) * B2A,
                               atol=1e-12)


def test_cmv_live_sigmoid_switching_between_two_methods():
    mod = _ref_module("multioptpy.optimizer")
    rng = np.random.default_rng(121)
    geom = rng.standard_normal((3, 3))
    direction = rng.standard_normal((3, 3))
    direction /= np.sqrt(np.mean(direction ** 2))  # rms = 1

    def gate(rms):
        return rms * direction

    # pure runs recover each engine's move for the same rms regime
    for rms, expect in ((0.2, "first"), (0.001, "second"),
                        (0.02, "blend")):
        b_g = gate(rms)
        new_both, _ = _run_cmv(mod, ["fire", "adam"], geom, b_g)
        new_fire, _ = _run_cmv(mod, ["fire"], geom, b_g)
        new_adam, _ = _run_cmv(mod, ["adam"], geom, b_g)
        mv_both = _recover_move(geom, new_both)
        mv_fire = _recover_move(geom, new_fire)
        mv_adam = _recover_move(geom, new_adam)
        if expect == "first":
            np.testing.assert_allclose(mv_both, mv_fire, atol=1e-12)
        elif expect == "second":
            np.testing.assert_allclose(mv_both, mv_adam, atol=1e-12)
        else:
            x = (rms - 0.005) / 0.045
            f = 1.0 / (1.0 + np.exp(-10.0 * (x - 0.5)))
            want = f * mv_fire + (1 - f) * mv_adam
            # the blend happens BEFORE the global trust clamp; at these
            # step sizes no clamping occurs
            np.testing.assert_allclose(mv_both, want, atol=1e-12)
            assert not np.allclose(mv_both, mv_fire)
            assert not np.allclose(mv_both, mv_adam)


def test_cmv_live_unknown_method_falls_back_to_fire():
    mod = _ref_module("multioptpy.optimizer")
    fire_mod = _ref_module("multioptpy.Optimizer.fire")
    cmv = _quiet(mod.CalculateMoveVector, DELTA=1.0,
                 element_list=["H", "H"])
    insts = _quiet(cmv.initialization, ["definitely_not_a_method"])
    assert len(insts) == 1
    assert isinstance(insts[0], fire_mod.FIRE)


def test_cmv_live_global_trust_clamp():
    mod = _ref_module("multioptpy.optimizer")
    rng = np.random.default_rng(122)
    geom = rng.standard_normal((3, 3))
    # a huge gradient makes FIRE's first move exceed the 0.5 default
    b_g = 300.0 * rng.standard_normal((3, 3))
    new_geom, move = _run_cmv(mod, ["fire"], geom, b_g)
    assert np.linalg.norm(move) == pytest.approx(0.5, rel=1e-10)
