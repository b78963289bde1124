"""LIVE parity wave 52: the rfo_neb blended band optimizer and the
composite-step TrustRadius engine — executed side by side with our
drivers/neb.py rfo clock and steppers' trust handling.

Conventions learned by execution (ref: Optimizer/rfo_neb.py,
trust_radius.py):

  * RFOOptimizer (rfo_neb.py:90-209) stores EVERY per-image Hessian in
    tmp_hessian_{i}.npy under NEB_FOLDER_DIRECTORY each iteration and
    reloads from disk on the next (:20-25): the filesystem is the
    Hessian state. A stale folder silently seeds a new run with old
    curvature (pinned: pre-seeding tmp_hessian_1.npy with an
    anisotropic matrix changes an otherwise identical run's geometry;
    isotropic seeds are invisible — the restricted step direction then
    reduces to the force direction). Missing files fall back to the
    identity.
  * Despite the docstring ("NEB might target saddle order 1") EVERY
    instance is built with saddle_order=0 (:118-122): energy-maximum
    nodes are NOT saddle-optimized — they just skip switch_NEB_mode()
    while minimizing. The _setup_rfo_optimizer helper that would set
    order 1 is dead in this path (pinned via instance inspection). Our
    rfo band clock keeps the same order-0 + tangent-projection design
    (drivers/neb.py:736-800).
  * _limit_step_size (:79-86) caps per-image norms at 0.2 (endpoints) /
    0.1 (interior) — distinct from the RSIRFO trust radii 0.5/0.2 the
    instances carry.
  * TrustRadius.update_trust_radii (trust_radius.py:120-207) predicts
    the energy change as Ce = +g.s + 1/2 s^T H s for a step applied as
    x -> x - s: on EXACT quadratic data with the exact Newton step the
    ratio r = (E_old-E_new)/Ce evaluates to (g.s - s.H.s/2)/(g.s +
    s.H.s/2) = 1/3 — never ~1; a perfect model lands in the "moderate"
    band and the radius is merely kept, while the "good prediction"
    increase branch (r in [0.75, 1.25]) is reachable only when the
    curvature term is < g.s/7 (pinned: r == 1/3 exactly). Poor
    predictions divide by the adaptive factor (2.0 with empty history,
    clamped to [1.1, 3.0]); call 0 is a no-op; output clipped to
    [min, max]. Like the wave-38/41 engines it requires pre-flattened
    (3N,1) columns.
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
# rfo_neb
# ==========================================================================

class _StubForceCalc:
    """calc_force returns the plain -gradient forces; no get_tau, so
    the Ayala Hessian update is skipped."""

    def calc_force(self, geoms, energies, forces, it, elements):
        return np.array(forces)


def _neb_config(tmp):
    return types.SimpleNamespace(
        NEB_FOLDER_DIRECTORY=str(tmp) + "/",
        fix_init_edge=False, fix_end_edge=False,
        apply_convergence_criteria=False,
        element_list=["H", "H", "H"], bohr2angstroms=1.0,
        ratio_of_rfo_step=0.5,
        dt=0.1, a=0.1, n_reset=0, FIRE_N_accelerate=5,
        FIRE_f_inc=1.1, FIRE_f_accelerate=0.99, FIRE_f_decelerate=0.5,
        FIRE_a_start=0.1, FIRE_dt_max=1.0)


def _run_rfo_neb(tmp, mod, n_iter=1):
    cfg = _neb_config(tmp)
    opt = mod.RFOOptimizer(cfg)
    rng = np.random.default_rng(110)
    n_img, n_atom = 3, 3
    band = np.array([i * 0.5 * np.ones((n_atom, 3))
                     + 0.3 * rng.standard_normal((n_atom, 3))
                     for i in range(n_img)])
    forces = 0.2 * rng.standard_normal((n_img, n_atom, 3))
    e = np.array([0.0, 1.0, 0.2])              # interior maximum at 1
    vel = np.zeros_like(band)
    prev_band, prev_forces = None, None
    out = band
    for it in range(n_iter):
        new = _quiet(opt.optimize, out, forces, prev_band, prev_forces,
                     it, e, np.zeros(3), vel, vel, None, None,
                     _StubForceCalc())
        prev_band, prev_forces = out, forces
        forces = 0.9 * forces                  # evolve a little
        out = np.asarray(new)
    return opt, out


def test_rfo_neb_live_hessian_state_lives_on_disk(tmp_path):
    mod = _ref_module("multioptpy.Optimizer.rfo_neb")
    a_dir = tmp_path / "a"
    a_dir.mkdir()
    _, out_fresh = _run_rfo_neb(a_dir, mod, n_iter=3)
    # per-image Hessian files were written
    for i in range(3):
        assert (a_dir / f"tmp_hessian_{i}.npy").exists()

    # a pre-seeded stale ANISOTROPIC Hessian changes the otherwise
    # identical run (iteration 1 is an SD-like first RSIRFO step; the
    # disk Hessian bites on later iterations)
    b_dir = tmp_path / "b"
    b_dir.mkdir()
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.standard_normal((9, 9)))
    np.save(str(b_dir / "tmp_hessian_1.npy"),
            (q * np.linspace(0.5, 50.0, 9)) @ q.T)
    _, out_seeded = _run_rfo_neb(b_dir, mod, n_iter=3)
    assert not np.allclose(out_fresh[1], out_seeded[1])


def test_rfo_neb_live_all_instances_are_order_zero(tmp_path):
    mod = _ref_module("multioptpy.Optimizer.rfo_neb")
    opt, _ = _run_rfo_neb(tmp_path, mod)
    assert len(opt.optimizer_instance_list) == 3
    for inst in opt.optimizer_instance_list:
        assert inst.saddle_order == 0          # maxima NOT saddle-opt
    # interior maximum keeps NEB_mode off; a non-maximum interior node
    # would have it on (here the only interior node IS the maximum)
    assert opt.optimizer_instance_list[1].NEB_mode is False


def test_rfo_neb_live_step_limits():
    mod = _ref_module("multioptpy.Optimizer.rfo_neb")
    alg = mod.RFOOptimizer.__new__(mod.RFOOptimizer)
    big = np.ones(6)
    out_end = alg._limit_step_size(big.copy(), True)
    out_int = alg._limit_step_size(big.copy(), False)
    assert np.linalg.norm(out_end) == pytest.approx(0.2)
    assert np.linalg.norm(out_int) == pytest.approx(0.1)
    small = 0.01 * np.ones(6)
    np.testing.assert_allclose(alg._limit_step_size(small.copy(), False),
                               small, atol=1e-15)


def test_rfo_neb_live_missing_hessian_file_defaults_to_identity(tmp_path):
    mod = _ref_module("multioptpy.Optimizer.rfo_neb")
    alg = mod.RFOOptimizer.__new__(mod.RFOOptimizer)
    cfg = types.SimpleNamespace(NEB_FOLDER_DIRECTORY=str(tmp_path) + "/")
    h = alg._load_or_init_hessian(0, 4, cfg)
    np.testing.assert_allclose(h, np.eye(12), atol=0)


# ==========================================================================
# TrustRadius
# ==========================================================================

def test_trust_radius_live_exact_newton_ratio_is_one_third():
    mod = _ref_module("multioptpy.Optimizer.trust_radius")
    tr = mod.TrustRadius(initial_trust_radius=0.3)
    rng = np.random.default_rng(111)
    d = 6
    a = rng.standard_normal((d, d))
    h = a @ a.T + d * np.eye(d)
    g = rng.standard_normal((d, 1))
    s = np.linalg.solve(h, g)                  # exact Newton step
    # quadratic model, step applied as x -> x - s:
    e_old = 0.0
    e_new = e_old - float(g.T @ s) + 0.5 * float(s.T @ h @ s)

    # call 0 is a no-op
    out0 = _quiet(tr.update_trust_radii, e_new, e_old, g, s, h,
                  np.zeros(d), 0.3)
    assert out0 == 0.3

    out1 = _quiet(tr.update_trust_radii, e_new, e_old, g, s, h,
                  np.zeros(d), 0.3)
    assert tr.energy_ratios[-1] == pytest.approx(1.0 / 3.0, rel=1e-12)
    assert out1 == pytest.approx(0.3)          # "moderate" -> keep


def test_trust_radius_live_poor_prediction_halves_with_default_factor():
    mod = _ref_module("multioptpy.Optimizer.trust_radius")
    tr = mod.TrustRadius(initial_trust_radius=0.4, max_trust_radius=1.0)
    tr.iteration_count = 1                     # skip the no-op call
    d = 6
    g = np.ones((d, 1))
    s = 0.01 * np.ones((d, 1))
    h = np.eye(d)
    # actual change ~0 while prediction is finite -> r ~ 0 <= 0.25
    out = _quiet(tr.update_trust_radii, 0.0, 0.0, g, s, h,
                 np.zeros(d), 0.4)
    # empty history -> adaptive factor exactly 2.0
    assert out == pytest.approx(0.2)

    # clip to min_trust_radius on repeated shrinks
    tr2 = mod.TrustRadius(initial_trust_radius=0.4, min_trust_radius=0.15)
    tr2.iteration_count = 1
    out2 = _quiet(tr2.update_trust_radii, 0.0, 0.0, g, s, h,
                  np.zeros(d), 0.2)
    assert out2 == pytest.approx(0.15)
