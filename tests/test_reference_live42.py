"""LIVE parity wave 42: the ApproxHessian dispatcher, the TS-Hessian
Householder transform, eigenvalue smoothing ("clip"), and the Morse
model Hessian — executed side by side with our hessian/model.py
(make_model_hessian_fn kind parsing, ts_model_hessian,
smooth_eigenvalues, morse_hessian).

Conventions learned by execution (ref: ModelHessian/approx_hessian.py,
tshess.py, morse.py):

  * ApproxHessian.main (approx_hessian.py:30-112) dispatches by
    SUBSTRING containment on the lowercased type, then applies
    "ts" / "sr" / "clip" POST-transforms, again by substring. Unknown
    types silently fall back to lindh2007d3 (:90-93, pinned). Our
    make_model_hessian_fn parses kind suffixes (_ts/_sr/d2-d4/_raw)
    instead — unknown base kinds raise.
  * TransitionStateHessian.create_ts_hessian (tshess.py:14-40): if any
    eigenvalue < -1e-8 the Hessian is returned UNCHANGED; otherwise it
    Householder-reflects along the first eigenvector whose |lambda| >=
    1e-8 (skipping leading TR/rot zeros), H_ts = sym((I - 2 v v^T) H).
    The class docstring promises "multiply by -1 and then add
    neg_eigenvalue" — no such addition exists in the code (the method
    takes no neg_eigenvalue and adds nothing); execution pins the
    docstring as stale. Our ts_model_hessian implements the same
    reflect-or-passthrough (equal to 1e-12 below).
  * smooth_eigval (approx_hessian.py:115-121) maps |l| >= 1 to
    sign(l) (2 - |l|^-alpha) — continuous at |l|=1, capped at 2.
    Our smooth_eigenvalues applies the identical spectral map.
  * MorseApproxHessian.create_model_hessian (morse.py:50-106) couples
    EVERY atom pair (N(N-1)/2 springs, no bond detection) and keeps
    ONLY the longitudinal d2V/dr^2 outer(u,u) block — the transverse
    (dV/dr)/r (I - u u^T) term of a true pair-potential Hessian is
    dropped, so the result is NOT the Hessian of any Morse energy
    (mirror-pinned; at off-equilibrium geometries the transverse part
    is O(|dV/dr|/r) and its absence shows up as curvature missing
    perpendicular to every pair axis). Its docstring says coords in
    Angstrom; the dispatcher feeds Bohr (:31 "coord: Bohr") with radii
    from GNB_radii_lib — our morse_hessian (hessian/model.py:464) is
    the exact autodiff Hessian of the summed Morse energy on Bohr
    coords instead, with the same De=0.10, a=0.20 defaults.
  * The gradient argument reaches only the lindh2007d* damped output
    transform and the "ts" branch — morse ignores it entirely
    (create_model_hessian(coord, element_list), :89).
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


def _h2o2():
    uv = _ref_module("multioptpy.Parameters.parameter").UnitValueLib()
    coord_ang = np.array([[1.607230637, 0.0, -4.017111134],
                          [1.607230637, 0.463701826, -2.637210910],
                          [2.429229637, 0.052572461, -2.324941515],
                          [0.785231637, -0.516274287, -4.017735703]])
    grad = np.array([[-0.0028911, -0.0015559, 0.0002471],
                     [0.0028769, -0.0013954, 0.0007272],
                     [-0.0025737, 0.0013921, -0.0007226],
                     [0.0025880, 0.0015592, -0.0002518]])
    return coord_ang / uv.bohr2angstroms, ["O", "O", "H", "H"], grad


# ==========================================================================
# dispatcher
# ==========================================================================

def test_dispatcher_live_unknown_type_falls_back_to_lindh2007d3():
    ah = _ref_module("multioptpy.ModelHessian.approx_hessian")
    coord, elems, grad = _h2o2()
    h_unknown = _quiet(ah.ApproxHessian().main, coord, elems, grad,
                       "definitely_not_a_type")
    h_l3 = _quiet(ah.ApproxHessian().main, coord, elems, grad,
                  "lindh2007d3")
    np.testing.assert_allclose(h_unknown, h_l3, atol=1e-14)

    # ours raises on unknown kinds instead of silently substituting
    from multioptpy_tpu.hessian.model import model_hessian
    with pytest.raises(Exception):
        model_hessian(coord, np.array([8, 8, 1, 1]),
                      kind="definitely_not_a_type")


def test_dispatcher_live_routes_match_dedicated_classes():
    ah = _ref_module("multioptpy.ModelHessian.approx_hessian")
    coord, elems, grad = _h2o2()
    pairs = [
        ("morse", lambda: ah.MorseApproxHessian().create_model_hessian(
            coord, elems)),
        ("fischer", lambda: ah.FischerApproxHessian().main(
            coord, elems, grad)),
        ("swartd2", lambda: ah.SwartD2ApproxHessian().main(
            coord, elems, grad)),
        ("schlegeld4", lambda: ah.SchlegelD4ApproxHessian().main(
            coord, elems, grad)),
        ("lindh2007d4", lambda: ah.Lindh2007D4ApproxHessian().main(
            coord, elems, grad)),
    ]
    for typ, direct in pairs:
        got = _quiet(ah.ApproxHessian().main, coord, elems, grad, typ)
        want = _quiet(direct)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=typ)
        assert np.allclose(got, got.T, atol=1e-10), typ


def test_dispatcher_live_clip_transform_matches_smooth_eigval():
    ah = _ref_module("multioptpy.ModelHessian.approx_hessian")
    coord, elems, grad = _h2o2()
    h_plain = _quiet(ah.ApproxHessian().main, coord, elems, grad,
                     "fischer")
    h_clip = _quiet(ah.ApproxHessian().main, coord, elems, grad,
                    "fischerclip")
    w, v = np.linalg.eigh(h_plain)
    w_s = ah.smooth_eigval(w, alpha=0.1)
    np.testing.assert_allclose(h_clip, (v * w_s) @ v.T, atol=1e-12)


# ==========================================================================
# smooth_eigval vs ours
# ==========================================================================

def test_smooth_eigval_live_matches_ours():
    ah = _ref_module("multioptpy.ModelHessian.approx_hessian")
    from multioptpy_tpu.hessian.model import smooth_eigenvalues
    import jax.numpy as jnp
    rng = np.random.default_rng(50)
    w = np.concatenate([rng.uniform(-5, 5, 20), [1.0, -1.0, 0.999,
                                                 -0.999, 37.0, -42.0]])
    want = ah.smooth_eigval(w, alpha=0.1)
    # continuous at |l| = 1, capped at 2
    assert abs(ah.smooth_eigval(np.array([1.0]))[0] - 1.0) < 1e-12
    assert ah.smooth_eigval(np.array([1e9]))[0] < 2.0
    # ours applies the same map to a matrix's spectrum
    q, _ = np.linalg.qr(rng.standard_normal((26, 26)))
    h = (q * w) @ q.T
    ours = np.asarray(smooth_eigenvalues(jnp.asarray(h), alpha=0.1))
    w_ours = np.sort(np.linalg.eigvalsh(ours))
    np.testing.assert_allclose(w_ours, np.sort(want), atol=1e-9)


# ==========================================================================
# TransitionStateHessian vs ours
# ==========================================================================

def test_tshess_live_passthrough_when_negative_mode_exists():
    ts = _ref_module("multioptpy.ModelHessian.tshess")
    eng = ts.TransitionStateHessian()
    rng = np.random.default_rng(51)
    q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    h = (q * np.array([-0.3, 0.1, 0.2, 0.5, 1.0, 2.0])) @ q.T
    got = eng.create_ts_hessian(h, None)
    np.testing.assert_allclose(got, h, atol=0)   # returned unchanged
    # docstring promises a neg_eigenvalue addition; the signature has
    # no such parameter — the docstring is stale
    import inspect
    sig = inspect.signature(eng.create_ts_hessian)
    assert "neg_eigenvalue" not in sig.parameters
    assert "neg_eigenvalue" in ts.TransitionStateHessian.__doc__


def test_tshess_live_householder_skips_leading_zeros_matches_ours():
    ts = _ref_module("multioptpy.ModelHessian.tshess")
    from multioptpy_tpu.hessian.model import ts_model_hessian
    import jax.numpy as jnp
    eng = ts.TransitionStateHessian()
    rng = np.random.default_rng(52)
    # PSD spectrum with a 3-fold zero block in front (TR-like)
    w = np.array([0.0, 0.0, 0.0, 0.05, 0.4, 1.1, 2.0, 3.0])
    q, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    h = (q * w) @ q.T
    got = eng.create_ts_hessian(h, None)
    wv, vv = np.linalg.eigh(h)
    count = 0
    for lam in wv:
        if abs(lam) < 1e-8:
            count += 1
        else:
            break
    v = vv[:, count]
    p = np.eye(8) - 2.0 * np.outer(v, v)
    want = p @ h
    want = 0.5 * (want + want.T)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # exactly one negative eigenvalue was created from the 0.05 mode
    assert (np.linalg.eigvalsh(got) < -1e-8).sum() == 1
    ours = np.asarray(ts_model_hessian(jnp.asarray(h)))
    np.testing.assert_allclose(ours, got, atol=1e-10)


# ==========================================================================
# Morse model Hessian
# ==========================================================================

def test_morse_live_mirror_and_missing_transverse_term():
    mod = _ref_module("multioptpy.ModelHessian.morse")
    par = _ref_module("multioptpy.Parameters.parameter")
    coord, elems, _ = _h2o2()
    eng = mod.MorseApproxHessian()
    got = eng.create_model_hessian(coord, elems)

    n = len(elems)
    de, a = 0.10, 0.20
    want = np.zeros((3 * n, 3 * n))
    for i in range(n - 1):
        for j in range(i + 1, n):
            r_eq = par.GNB_radii_lib(elems[i]) + par.GNB_radii_lib(
                elems[j])
            vec = coord[j] - coord[i]
            r = np.linalg.norm(vec)
            x = a * (r - r_eq)
            d2 = de * a * a * (-2.0 * np.exp(-x) + 4.0 * np.exp(-2 * x))
            u = vec / r
            blk = d2 * np.outer(u, u)
            want[3 * i:3 * i + 3, 3 * i:3 * i + 3] += blk
            want[3 * j:3 * j + 3, 3 * j:3 * j + 3] += blk
            want[3 * i:3 * i + 3, 3 * j:3 * j + 3] -= blk
            want[3 * j:3 * j + 3, 3 * i:3 * i + 3] -= blk
    np.testing.assert_allclose(got, want, atol=1e-13)

    # every pair block is RANK 1 (longitudinal only): contracting the
    # off-diagonal ij block with any vector orthogonal to u_ij is 0 —
    # a true pair-potential Hessian would contribute (dV/dr)/r there
    i, j = 0, 1
    vec = coord[j] - coord[i]
    u = vec / np.linalg.norm(vec)
    blk = got[3 * i:3 * i + 3, 3 * j:3 * j + 3]
    perp = np.array([-u[1], u[0], 0.0])
    perp -= (perp @ u) * u
    perp /= np.linalg.norm(perp)
    np.testing.assert_allclose(blk @ perp, 0.0, atol=1e-14)

    # ours is the exact autodiff Hessian of the Morse energy: the same
    # contraction is NONZERO (transverse curvature present)
    from multioptpy_tpu.hessian.model import morse_hessian
    import jax.numpy as jnp
    ours = np.asarray(morse_hessian(jnp.asarray(coord),
                                    np.array([8, 8, 1, 1])))
    blk_o = ours[3 * i:3 * i + 3, 3 * j:3 * j + 3]
    assert np.abs(blk_o @ perp).max() > 1e-6
    assert np.allclose(ours, ours.T, atol=1e-12)
