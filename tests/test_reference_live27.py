"""LIVE parity wave 27: MF_RSIRFO (mode-following RS-I-RFO) and its
ModeFollowing tracker — the reference's own classes executed side by side
with our rs_rfo_step image construction and mode_following_direction.

Conventions learned by execution (ref: Optimizer/mf_rsirfo.py,
Optimizer/mode_following.py):

  * Method-string grammar "name:idx:ema<a>:grad<w>" (mf_rsirfo.py:51-92):
    digits -> target mode index, ema<a> -> EMA rate (and adaptive=True iff
    a > 1e-12), grad<w> -> gradient-overlap bias weight; the bare name is
    forwarded to the parent RSIRFO as the Hessian-update method. Pinned on
    "fsb:1:ema0.5:grad0.3" and the static "fsb:ema0".
  * The iteration-0 target is the RAW eigenvalue index into the TR/rot-
    PROJECTED spectrum (mf_rsirfo.py:191-192) — and the default index 0 is
    a TR/rot null mode (|eigval| ~ 1e-17 on our water fixture). The image
    projector skips modes with |eigval| <= 1e-10 (:229), so the default
    "saddle" step is EXACTLY the plain RSIRFO minimization restricted
    step. Pinned to 1e-12 against our rs_rfo_step(saddle_order=0).
  * With a live tracked mode v (raw index 6 on water), the image surface
    is H* = (I-2vv^T)H, g* = (I-2vv^T)g — in the eigenbasis this flips
    the SIGN of the tracked eigenvalue and gradient component. Our
    equivalent flip construction reproduces the reference's returned step
    to 1e-9 (sign convention: ref returns the move the driver SUBTRACTS).
  * UPSTREAM DEFECT, pinned by execution: the RS ("restricted step")
    machinery of solve_rfo is a mathematical NO-OP. solve_rfo
    (rsirfo.py:1688-1715) scales BOTH eigvals and gradient by 1/alpha
    (grad_comps_prime_sq = (g/alpha)^2, :1544-1546) — substituting
    lambda = mu/alpha shows the secular root scales exactly as mu*/alpha
    and the step s_i = -g_i/(lambda_i - mu*) is alpha-INDEPENDENT (the
    correct Besalu-Bofill scaling divides g_i^2 by alpha ONCE — the
    asymmetric bordered matrix [[H/a, g/a],[g^T, 0]]). Consequently
    compute_rsprfo_step's brentq can never bracket (the step norm is the
    same at every alpha) and get_rs_step returns the UNRESTRICTED plain
    RFO step: on our fixture MF_RSIRFO.run() returns a 23.2-Bohr move
    against its own 0.1-Bohr trust radius (232x). In the full reference
    driver the step is only saved by the radial rescale at
    optimizer.py:792-793 — i.e. upstream "RS-RFO" degrades to plain RFO +
    radial clamp. Ours implements the real restricted step (log-alpha
    bisection to the trust boundary, steppers/rfo.py) — deliberately NOT
    bug-compatible; on this fixture the true boundary step happens to be
    radial too, which the test records.
    (Note: an earlier session's claim that MF_RSIRFO.run "never returns
    the move vector" is FALSE — verified returning at mf_rsirfo.py:266.)
  * ModeFollowing._calc_overlap (mode_following.py:90-111) is the
    mass-weighted cosine dot(v1*M, v2)/(|v1|_M |v2|_M) with masses
    repeated 3x per atom — pinned against the analytic formula.
  * Matching is Hungarian (scipy linear_sum_assignment on -similarity)
    or greedy per-reference argmax; pinned on a 6-D fixture where the
    two genuinely differ (greedy sacrifices ref1's good match, Hungarian
    recovers the globally optimal pairing).
  * gradient_weight adds w*|<g_hat, mode_j>| UNIFORMLY per column j
    (mode_following.py:189-190) — a column-constant bias that CAN change
    single-reference selection (pinned: weight 0.5 flips the matched
    index from the best-overlap mode to the gradient-aligned mode).
  * Adaptive EMA update (mode_following.py:251-268): the matched
    eigenvector is sign-aligned to the reference (phase correction),
    blended v_new = (1-a) v_old + a v_cur, then re-normalized in the
    SAME (mass-weighted) metric — pinned to 1e-12.

Ref anchors: Optimizer/mf_rsirfo.py:35-266, Optimizer/mode_following.py:
18-272, Optimizer/rsirfo.py:924-984 (get_rs_step), :1505-1686 (secular),
:1688-1715 (solve_rfo); ours: steppers/rfo.py rs_rfo_step,
steppers/enhancements.py mode_following_direction.
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


def _water_fixture():
    """Distorted water (Bohr), a small random gradient, and a raw Lindh
    model Hessian (both sides apply their own TR/rot projection)."""
    from multioptpy_tpu.hessian.model import model_hessian

    geom = np.array([[0.00, 0.00, 0.25],
                     [0.10, 1.52, -0.95],
                     [-0.05, -1.49, -0.93]])
    z = np.array([8, 1, 1])
    h = np.asarray(model_hessian(jnp.asarray(geom), z, kind="lindh",
                                 project=False))
    rng = np.random.default_rng(7)
    g = rng.normal(scale=3e-3, size=9)
    return geom, g, h


def _projected(geom, g, h):
    from multioptpy_tpu.geometry import (project_gradient_tr_rot,
                                          project_hessian_tr_rot)

    g_p = np.asarray(project_gradient_tr_rot(
        jnp.asarray(g.reshape(-1, 3)), jnp.asarray(geom))).flatten()
    h_p = np.asarray(project_hessian_tr_rot(jnp.asarray(h),
                                            jnp.asarray(geom)))
    return g_p, h_p


# ==========================================================================
# Method-string grammar
# ==========================================================================

def test_mf_method_string_parsing_live():
    mf_mod = _ref_module("multioptpy.Optimizer.mf_rsirfo")

    with contextlib.redirect_stdout(io.StringIO()):
        ref = mf_mod.MF_RSIRFO(saddle_order=1, display_flag=False,
                               method="fsb:1:ema0.5:grad0.3")
    assert ref.hessian_update_method == "fsb"
    assert ref.mode_follower.target_offset == 1
    assert ref.mode_follower.adaptive is True
    assert ref.mode_follower.update_rate == pytest.approx(0.5)
    assert ref.mode_follower.gradient_weight == pytest.approx(0.3)

    # ema0 forces the STATIC tracker (adaptive iff rate > 1e-12)
    with contextlib.redirect_stdout(io.StringIO()):
        ref2 = mf_mod.MF_RSIRFO(saddle_order=1, display_flag=False,
                                method="fsb:ema0")
    assert ref2.mode_follower.adaptive is False
    assert ref2.mode_follower.update_rate == pytest.approx(0.0)
    # bare name: adaptive default with full replacement (EMA alpha = 1)
    with contextlib.redirect_stdout(io.StringIO()):
        ref3 = mf_mod.MF_RSIRFO(saddle_order=1, display_flag=False,
                                method="fsb")
    assert ref3.mode_follower.adaptive is True
    assert ref3.mode_follower.update_rate == pytest.approx(1.0)


# ==========================================================================
# Default target = TR/rot null mode -> plain minimization step
# ==========================================================================

def test_mf_default_target_is_trrot_null_mode_live():
    mf_mod = _ref_module("multioptpy.Optimizer.mf_rsirfo")
    from multioptpy_tpu.steppers.rfo import rs_rfo_step

    geom, g, h = _water_fixture()
    g_p, h_p = _projected(geom, g, h)
    w = np.linalg.eigvalsh(h_p)
    # raw index 0 of the projected spectrum is a TR/rot null mode, below
    # the image projector's 1e-10 participation guard (mf_rsirfo.py:229)
    assert abs(w[0]) < 1e-10

    ref = mf_mod.MF_RSIRFO(saddle_order=1, display_flag=False, method="fsb")
    ref.set_hessian(h.copy())
    with contextlib.redirect_stdout(io.StringIO()):
        mv = np.asarray(ref.run(geom.flatten(), g.copy(), B_e=-1.0,
                                g=g.copy())).ravel()
    assert ref.mode_follower.reference_indices == [0]

    # P stayed identity => the step is our MINIMIZATION restricted step
    ours, _ = rs_rfo_step(jnp.asarray(g_p), jnp.asarray(h_p),
                          trust_radius=ref.trust_radius, saddle_order=0)
    assert np.linalg.norm(mv + np.asarray(ours)) < 1e-12


# ==========================================================================
# Tracked live mode -> image flip; RS machinery is a no-op upstream
# ==========================================================================

def test_mf_tracked_mode_image_flip_and_rs_noop_live():
    mf_mod = _ref_module("multioptpy.Optimizer.mf_rsirfo")
    from multioptpy_tpu.steppers.rfo import rs_rfo_step

    geom, g, h = _water_fixture()
    g_p, h_p = _projected(geom, g, h)
    w, v = np.linalg.eigh(h_p)
    i_live = int(np.argmax(np.abs(w) > 1e-6))
    assert i_live == 6  # 6 TR/rot null modes precede the live spectrum

    ref = mf_mod.MF_RSIRFO(saddle_order=1, display_flag=False,
                           method=f"fsb:{i_live}")
    ref.set_hessian(h.copy())
    with contextlib.redirect_stdout(io.StringIO()):
        mv = np.asarray(ref.run(geom.flatten(), g.copy(), B_e=-1.0,
                                g=g.copy())).ravel()

    # UPSTREAM DEFECT pinned: the returned move violates the engine's own
    # trust radius by >100x because solve_rfo's alpha scaling cancels out
    assert ref.trust_radius == pytest.approx(0.1)
    assert np.linalg.norm(mv) > 100 * ref.trust_radius

    # the step IS the unrestricted plain RFO step on the image surface:
    # flip the tracked eigenpair's sign in (g, H) and solve unrestricted
    vv = v[:, i_live]
    h_flip = h_p - 2.0 * w[i_live] * np.outer(vv, vv)
    g_flip = g_p - 2.0 * np.dot(vv, g_p) * vv
    ours_unres, _ = rs_rfo_step(jnp.asarray(g_flip), jnp.asarray(h_flip),
                                trust_radius=1e9, saddle_order=0)
    assert np.linalg.norm(mv + np.asarray(ours_unres)) < 1e-8

    # ours at the same trust radius honors it (true restricted step);
    # on this fixture the boundary step coincides with the radial rescale
    ours_r, _ = rs_rfo_step(jnp.asarray(g_flip), jnp.asarray(h_flip),
                            trust_radius=0.1, saddle_order=0)
    assert np.linalg.norm(np.asarray(ours_r)) == pytest.approx(0.1, rel=1e-6)


def test_solve_rfo_alpha_scaling_is_noop_live():
    """Direct probe: the secular root scales exactly as mu/alpha and the
    step norm is alpha-invariant (rsirfo.py:1544-1546 double-divides the
    gradient by alpha)."""
    rs_mod = _ref_module("multioptpy.Optimizer.rsirfo")

    geom, g, h = _water_fixture()
    g_p, h_p = _projected(geom, g, h)
    w, v = np.linalg.eigh(h_p)
    live = np.abs(w) > 1e-6
    wf, vf = w[live], v[:, live]
    gt = vf.T @ g_p

    ref = rs_mod.RSIRFO(saddle_order=0, display_flag=False)
    roots, norms = [], []
    for alpha in (1.0, 10.0, 100.0, 1000.0):
        with contextlib.redirect_stdout(io.StringIO()):
            step, ev, _, _ = ref.solve_rfo(wf.copy(), gt.copy(), alpha)
        roots.append(ev * alpha)
        norms.append(np.linalg.norm(step))
    # alpha * root is a constant (the PLAIN RFO secular root) up to the
    # upstream solver's own brentq tolerance ...
    assert np.ptp(roots) < 1e-5 * abs(roots[0])
    # ... and the step never shrinks with alpha — "restricted" is a no-op
    assert np.ptp(norms) < 1e-6 * norms[0]


# ==========================================================================
# ModeFollowing: metric, matching, bias, EMA
# ==========================================================================

def test_mode_following_mass_weighted_overlap_live():
    mfol = _ref_module("multioptpy.Optimizer.mode_following")

    with contextlib.redirect_stdout(io.StringIO()):
        f = mfol.ModeFollowing(1, atoms=["O", "H"])
    m = np.asarray(f.mass_weights)
    assert m.shape == (6,)
    assert m[0] == pytest.approx(m[1]) == pytest.approx(m[2])
    assert m[0] / m[3] == pytest.approx(15.87, rel=1e-2)  # m(O)/m(H)

    rng = np.random.default_rng(27)
    v1, v2 = rng.normal(size=6), rng.normal(size=6)
    ov = f._calc_overlap(v1, v2)
    expect = (v1 * m) @ v2 / (np.sqrt((v1 * m) @ v1) *
                              np.sqrt((v2 * m) @ v2))
    assert ov == pytest.approx(expect, abs=1e-14)


def test_mode_following_hungarian_vs_greedy_live():
    """6-D fixture where per-reference greedy matching is globally
    suboptimal: greedy gives ref0 its best mode 0, forcing ref1 off both
    good modes; Hungarian recovers the optimal (ref0->1, ref1->0)."""
    mfol = _ref_module("multioptpy.Optimizer.mode_following")

    def unit(head):
        r = np.zeros(6)
        r[:len(head)] = head
        rest = 1.0 - np.dot(r, r)
        r[len(head):] = np.sqrt(rest / (6 - len(head)))
        return r

    refs = np.stack([unit([0.60, 0.58]), unit([0.59, 0.10])], axis=1)

    out = {}
    for use_h in (True, False):
        with contextlib.redirect_stdout(io.StringIO()):
            f = mfol.ModeFollowing(2, use_hungarian=use_h)
            f.set_references(refs.copy())
            out[use_h] = list(map(int, f.get_matched_indices(np.eye(6))))
    assert out[False] == [0, 2]     # greedy: ref0 grabs 0, ref1 falls to 2
    assert out[True] == [1, 0]      # Hungarian: globally optimal pairing
    # and Hungarian is what scipy's assignment on |overlaps| gives
    from scipy.optimize import linear_sum_assignment
    sim = np.abs(refs.T @ np.eye(6))
    rr, cc = linear_sum_assignment(-sim)
    assert out[True] == [int(cc[list(rr).index(k)]) for k in range(2)]


def test_mode_following_gradient_bias_flips_selection_live():
    mfol = _ref_module("multioptpy.Optimizer.mode_following")

    r1 = np.array([[0.8], [0.6], [0.0]])
    grad = np.array([0.0, 1.0, 0.0])
    got = {}
    for gw in (0.0, 0.5):
        with contextlib.redirect_stdout(io.StringIO()):
            f = mfol.ModeFollowing(1, gradient_weight=gw)
            f.set_references(r1.copy())
            got[gw] = int(f.get_matched_indices(np.eye(3),
                                                current_gradient=grad)[0])
    assert got[0.0] == 0   # pure overlap picks the 0.8 mode
    assert got[0.5] == 1   # 0.6 + 0.5*1.0 outbids 0.8 + 0.5*0.0

    # ours (greedy pure-overlap tracker) agrees with the unbiased case
    from multioptpy_tpu.steppers.enhancements import mode_following_direction
    h = np.diag([1.0, 2.0, 3.0])  # eigvecs = identity
    vec, _ = mode_following_direction(jnp.asarray(h),
                                      reference_mode=jnp.asarray(r1[:, 0]))
    assert int(np.argmax(np.abs(np.asarray(vec)))) == 0


def test_mode_following_ema_sign_aligned_update_live():
    mfol = _ref_module("multioptpy.Optimizer.mode_following")

    with contextlib.redirect_stdout(io.StringIO()):
        f = mfol.ModeFollowing(1, atoms=["O", "H"], adaptive=True,
                               update_rate=0.5)
    m = np.asarray(f.mass_weights)

    r = np.array([0.1, 0.0, -0.95, 0.2, 0.0, 0.1])
    r = r / np.sqrt((r * m) @ r)  # unit in the MASS metric
    with contextlib.redirect_stdout(io.StringIO()):
        f.set_references(r.reshape(-1, 1).copy())
        idx = f.get_matched_indices(np.eye(6))
    # matched the e2 axis with NEGATIVE overlap -> phase-corrected blend
    assert list(map(int, idx)) == [2]
    e2 = np.eye(6)[:, 2]
    blend = 0.5 * r + 0.5 * (-e2)
    blend = blend / np.sqrt((blend * m) @ blend)
    assert np.linalg.norm(np.asarray(f.reference_modes[0]) - blend) < 1e-12
