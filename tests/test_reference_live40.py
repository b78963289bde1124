"""LIVE parity wave 40: the NEB per-image optimizer clocks — the
reference's gradientdescent_neb / trust_radius_neb / fire_neb /
quickmin_neb / afire_neb executed side by side with our band clocks in
drivers/neb.py (afire_step, the sd/quickmin/fire optimizer branches).

Conventions learned by execution (ref: Optimizer/*_neb.py):

  * UNITS: every *_neb optimizer returns (geometry + move) *
    bohr2angstroms — the caller passes Bohr and receives Angstrom from
    the SAME array (neb.py feeds it back through ang2bohr each
    iteration). Our band step stays in Bohr throughout.
  * SteepestDescentOptimizer (gradientdescent_neb.py:22-51): delta is
    HARDCODED 0.5 (our NEBConfig.sd_step default matches), interior
    clamp radii are HALF the neighbor distances, and the clamp order is
    `if ||d||>tr1: ->tr1 elif ||d||>tr2: ->tr2` — when BOTH are violated
    and tr2 < tr1 the step is clamped to the LARGER tr1, not
    min(tr1,tr2) (pinned below).
  * TR_NEB.TR_calc (trust_radius_neb.py:17-98): endpoints are clamped to
    length min(0.5, ||delta||); interior images are ZEROED whenever
    force.delta < 0 (projected velocity-Verlet); the straddle-cos
    branch clamps to the radius on the side the step points toward; the
    method unconditionally appends to procrustes_distance_{1,2}.csv
    (NEB_FOLDER_DIRECTORY must exist — a filesystem side effect inside
    the step math). Our per_image_trust=True reimplements the same
    half-neighbor-distance + projected-VV rule vectorized.
  * TR_NEB.check_convergence (trust_radius_neb.py:100-120) uses SIGNED
    np.max on the force and move arrays — an image whose largest force
    component is -5e-4 (|f| well above threshold_max_force=4.5e-4)
    passes the max-force test and can be frozen as "converged" while the
    mirrored +5e-4 image is not (pinned). Ours uses max|f|.
  * FIREOptimizer (fire_neb.py:38-92) runs ONE GLOBAL clock for the
    whole band (power = sum over all images/atoms of v_pre.F); on the
    very first call it zeroes the velocity AND decelerates
    (dt *= f_decelerate before any power information exists); on
    acceleration `self.a *= FIRE_f_inc` — the mixing parameter GROWS
    without bound (published FIRE and our afire_step SHRINK alpha by
    f_a=0.99); accelerated steps integrate a trapezoid
    total_delta = dt (v_new + v_pre).
  * QuickMin_NEB (quickmin_neb.py): initialize_data builds velocities as
    np.zeros_like(i) over range(num_images) — 0-d INT arrays — later
    self-healed by the shape check (:105); the step is
    dt * (mixing*(v_par + dt F) + (1-mixing) v_old) — a dt^2-scaled
    first step 0.9 dt^2 F, NOT the published v dt; the "projection onto
    the force direction" is MIS-SCALED by |F| (:111,124: v_parallel =
    (v.F) f_hat — the dot is taken against the UNNORMALIZED force, so
    v_par = |F| (v.f_hat) f_hat; pinned); on an energy rise the stored
    velocity is reset to zero AFTER the step was already computed, so
    the returned geometry still moves by the pre-reset step (pinned).
  * AFIRE_NEB (afire_neb.py:81-166) keeps per-image dt/alpha/n_pos
    clocks like our AFireState, but integrates a HALF-step Verlet
    (new_v = mixed + 0.5 dt F, :137), and its uphill reset OVERWRITES
    the freshly integrated velocity (:164 new_velocities[i] = 0 after
    the step): starting from v=0, power is 0 on EVERY call, so the
    stored velocity never leaves zero and dt decays geometrically by
    f_dec — a zero-velocity fixed point in which AFIRE degenerates to
    steepest descent with a vanishing 0.5 dt^2 step (measured: dt =
    0.05, 0.025, 0.0125, ... from dt_start=0.1). Our afire_step adds
    dt F AFTER the reset choice (drivers/neb.py:586-587), so inertia
    builds from rest. With a warm-started velocity the reference
    accelerates on call 6 (increment-then-check n_pos > n_min=5); ours
    on call 8 from rest (call 1 is the power=0 deceleration, n_good
    counts completed downhill calls, check-then-increment) — both
    measured and pinned below.
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


def _band(rng, n_img=5, n_atom=3, spread=1.0):
    """A synthetic Bohr band: images along a line + noise."""
    base = rng.standard_normal((n_atom, 3))
    direction = rng.standard_normal((n_atom, 3))
    geoms = np.array([base + spread * t * direction
                      + 0.05 * rng.standard_normal((n_atom, 3))
                      for t in np.linspace(0.0, 1.0, n_img)])
    forces = 0.1 * rng.standard_normal((n_img, n_atom, 3))
    return geoms, forces


# ==========================================================================
# SteepestDescentOptimizer (gradientdescent_neb.py)
# ==========================================================================

def _sd_replica(geoms, forces, fix_init, fix_end, b2a):
    delta = 0.5
    total_delta = [delta * f for f in forces]
    move = [total_delta[0] * (0.0 if fix_init else 1.0)]
    for i in range(1, len(total_delta) - 1):
        tr1 = np.linalg.norm(geoms[i] - geoms[i - 1]) / 2.0
        tr2 = np.linalg.norm(geoms[i] - geoms[i + 1]) / 2.0
        nrm = np.linalg.norm(total_delta[i])
        if nrm > tr1:
            move.append(total_delta[i] * tr1 / nrm)
        elif nrm > tr2:
            move.append(total_delta[i] * tr2 / nrm)
        else:
            move.append(total_delta[i])
    move.append(total_delta[-1] * (0.0 if fix_end else 1.0))
    return (geoms + np.array(move)) * b2a


def test_sd_neb_live_matches_replica():
    mod = _ref_module("multioptpy.Optimizer.gradientdescent_neb")
    rng = np.random.default_rng(40)
    for fix_init, fix_end in ((False, False), (True, True)):
        cfg = types.SimpleNamespace(fix_init_edge=fix_init,
                                    fix_end_edge=fix_end,
                                    bohr2angstroms=B2A)
        opt = mod.SteepestDescentOptimizer(cfg)
        for _ in range(5):
            geoms, forces = _band(rng)
            got = _quiet(opt.optimize, geoms, forces)
            want = _sd_replica(geoms, forces, fix_init, fix_end, B2A)
            np.testing.assert_allclose(got, want, atol=1e-14)


def test_sd_neb_live_clamps_to_larger_radius_when_both_violated():
    mod = _ref_module("multioptpy.Optimizer.gradientdescent_neb")
    cfg = types.SimpleNamespace(fix_init_edge=True, fix_end_edge=True,
                                bohr2angstroms=1.0)
    opt = mod.SteepestDescentOptimizer(cfg)
    # 3 images on the x axis: |g1-g0| = 2.0 (tr1 = 1.0),
    # |g1-g2| = 0.4 (tr2 = 0.2); interior force 0.5*|F| = 3.0 > both
    geoms = np.zeros((3, 1, 3))
    geoms[0, 0, 0] = -2.0
    geoms[1, 0, 0] = 0.0
    geoms[2, 0, 0] = 0.4
    forces = np.zeros((3, 1, 3))
    forces[1, 0, 1] = 6.0                      # delta = 3.0 in +y
    got = _quiet(opt.optimize, geoms, forces)
    step = got[1] - geoms[1]
    # clamped to tr1 = 1.0, NOT min(tr1, tr2) = 0.2
    np.testing.assert_allclose(np.linalg.norm(step), 1.0, atol=1e-12)


# ==========================================================================
# TR_NEB (trust_radius_neb.py)
# ==========================================================================

def _tr_replica(geoms, forces, delta, fix_init, fix_end):
    move = []
    if fix_init:
        move.append(delta[0] * 0.0)
    else:
        n0 = np.linalg.norm(delta[0])
        move.append(delta[0] * 0.0 if n0 < 1e-15
                    else min(0.5, n0) * delta[0] / n0)
    for i in range(1, len(delta) - 1):
        tr1 = np.linalg.norm(geoms[i] - geoms[i - 1]) / 2.0
        tr2 = np.linalg.norm(geoms[i] - geoms[i + 1]) / 2.0
        v1 = (geoms[i - 1] - geoms[i])
        v1 = v1 / (np.linalg.norm(v1) + 1e-15)
        v2 = (geoms[i + 1] - geoms[i])
        v2 = v2 / (np.linalg.norm(v2) + 1e-15)
        nd = delta[i] / np.linalg.norm(delta[i])
        c1, c2 = np.sum(v1 * nd), np.sum(v2 * nd)
        fc = np.sum(forces[i] * delta[i]) / (
            np.linalg.norm(forces[i]) * np.linalg.norm(delta[i]))
        nrm = np.linalg.norm(delta[i])
        if fc >= 0:
            if (c1 > 0 and c2 < 0) or (c1 < 0 and c2 > 0):
                if nrm > tr1 and c1 > 0:
                    move.append(delta[i] * tr1 / nrm)
                elif nrm > tr2 and c2 > 0:
                    move.append(delta[i] * tr2 / nrm)
                else:
                    move.append(delta[i])
            elif c1 < 0 and c2 < 0:
                move.append(delta[i])
            else:
                if nrm > tr1:
                    move.append(delta[i] * tr1 / nrm)
                elif nrm > tr2:
                    move.append(delta[i] * tr2 / nrm)
                else:
                    move.append(delta[i])
        else:
            move.append(delta[i] * 0.0)
    if fix_end:
        move.append(delta[-1] * 0.0)
    else:
        ne = np.linalg.norm(delta[-1])
        move.append(delta[-1] * 0.0 if ne < 1e-15
                    else min(0.5, ne) * delta[-1] / ne)
    return move


def test_tr_neb_live_matches_replica(tmp_path):
    mod = _ref_module("multioptpy.Optimizer.trust_radius_neb")
    tr = mod.TR_NEB(NEB_FOLDER_DIRECTORY=str(tmp_path) + "/",
                    fix_init_edge=False, fix_end_edge=False,
                    apply_convergence_criteria=False)
    rng = np.random.default_rng(7)
    for k in range(8):
        geoms, forces = _band(rng, n_img=6)
        # mix of small and endpoint-clamping-sized deltas
        delta = (2.0 if k % 2 else 0.05) * rng.standard_normal(geoms.shape)
        got = _quiet(tr.TR_calc, geoms, forces, delta.copy(),
                     np.zeros(6), np.zeros(6), None)
        want = _tr_replica(geoms, forces, delta, False, False)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-13)
    # the CSV side effect happened inside the step math
    assert (tmp_path / "procrustes_distance_1.csv").exists()
    assert (tmp_path / "procrustes_distance_2.csv").exists()


def test_tr_neb_live_endpoint_cap_is_half_bohr():
    mod = _ref_module("multioptpy.Optimizer.trust_radius_neb")
    tr = mod.TR_NEB(NEB_FOLDER_DIRECTORY="/tmp/",
                    fix_init_edge=False, fix_end_edge=False,
                    apply_convergence_criteria=False)
    geoms, forces = _band(np.random.default_rng(3), n_img=4)
    delta = np.ones_like(geoms)               # ||delta_img|| ~ 3.46 > 0.5
    got = _quiet(tr.TR_calc, geoms, forces, delta, np.zeros(4),
                 np.zeros(4), None)
    np.testing.assert_allclose(np.linalg.norm(got[0]), 0.5, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(got[-1]), 0.5, atol=1e-12)


def test_tr_neb_live_convergence_max_is_signed():
    """check_convergence freezes an all-negative-force image."""
    mod = _ref_module("multioptpy.Optimizer.trust_radius_neb")
    tr = mod.TR_NEB(NEB_FOLDER_DIRECTORY="/tmp/",
                    apply_convergence_criteria=True)
    n_img, n_atom = 4, 2
    forces = np.zeros((n_img, n_atom, 3))
    moves = [np.full((n_atom, 3), -1e-5) for _ in range(n_img)]
    # one interior image with a -5e-4 force component: |f| > 4.5e-4
    # threshold, but signed max = -5e-4 < 4.5e-4 -> "converged", zeroed
    forces[1, 0, 0] = -5e-4
    # mirrored +5e-4 image -> NOT converged, move kept
    forces[2, 0, 0] = +5e-4
    out = _quiet(tr.check_convergence, forces, [m.copy() for m in moves])
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[2], moves[2])


# ==========================================================================
# FIREOptimizer (fire_neb.py) — global band clock
# ==========================================================================

def _fire_cfg(tmp, **over):
    d = dict(dt=0.1, a=0.1, n_reset=0, FIRE_N_accelerate=5,
             FIRE_f_inc=1.1, FIRE_f_accelerate=0.99,
             FIRE_f_decelerate=0.5, FIRE_a_start=0.1, FIRE_dt_max=1.0,
             NEB_FOLDER_DIRECTORY=str(tmp) + "/", fix_init_edge=False,
             fix_end_edge=False, apply_convergence_criteria=False,
             bohr2angstroms=B2A)
    d.update(over)
    return types.SimpleNamespace(**d)


def test_fire_neb_live_first_call_decelerates_and_zeroes(tmp_path):
    fmod = _ref_module("multioptpy.Optimizer.fire_neb")
    tmod = _ref_module("multioptpy.Optimizer.trust_radius_neb")
    opt = fmod.FIREOptimizer(_fire_cfg(tmp_path))
    rng = np.random.default_rng(11)
    geoms, forces = _band(rng, n_img=4)
    vel = rng.standard_normal(geoms.shape)     # ignored: first call zeroes
    got = _quiet(opt.optimize, geoms, forces, np.zeros_like(vel), 0,
                 vel, None, np.zeros(4), np.zeros(4), None)
    # dt decelerated on the very first call, before any power info
    assert opt.dt == pytest.approx(0.05)
    assert opt.a == pytest.approx(0.1)
    # velocity zeroed -> v_new = dt F, delta = dt v_new = dt^2 F
    delta = 0.05 * (0.05 * forces)
    tr = tmod.TR_NEB(NEB_FOLDER_DIRECTORY=str(tmp_path) + "/",
                     fix_init_edge=False, fix_end_edge=False,
                     apply_convergence_criteria=False)
    move = _quiet(tr.TR_calc, geoms, forces, delta, np.zeros(4),
                  np.zeros(4), None)
    np.testing.assert_allclose(got, (geoms + move) * B2A, atol=1e-13)


def test_fire_neb_live_alpha_grows_on_acceleration(tmp_path):
    """Ref: a *= f_inc (fire_neb.py:70) — published FIRE (and our
    afire_step) multiply alpha by f_a=0.99 instead."""
    fmod = _ref_module("multioptpy.Optimizer.fire_neb")
    opt = fmod.FIREOptimizer(_fire_cfg(tmp_path, n_reset=6))
    rng = np.random.default_rng(5)
    geoms, forces = _band(rng, n_img=4)
    pre_vel = forces.copy()                    # aligned: global power > 0
    _quiet(opt.optimize, geoms, forces, pre_vel, 1,
           np.zeros_like(forces), None, np.zeros(4), np.zeros(4), None)
    assert opt.dt == pytest.approx(0.1 * 1.1)
    assert opt.a == pytest.approx(0.1 * 1.1)   # GROWS
    assert opt.n_reset == 7

    # ours shrinks alpha by f_acc on the accelerated image
    from multioptpy_tpu.drivers.neb import afire_init, afire_step
    import jax.numpy as jnp
    st = afire_init(4, 3)
    st = st._replace(velocity=jnp.asarray(forces),
                     n_good=jnp.full((4,), 6, jnp.int32))
    _, st2 = afire_step(st, jnp.asarray(forces))
    assert float(st2.alpha[0]) == pytest.approx(0.1 * 0.99)
    assert float(st2.dt[0]) == pytest.approx(0.1 * 1.1)


def test_fire_neb_live_uphill_resets_clock(tmp_path):
    fmod = _ref_module("multioptpy.Optimizer.fire_neb")
    opt = fmod.FIREOptimizer(_fire_cfg(tmp_path, n_reset=6, a=0.3))
    rng = np.random.default_rng(6)
    geoms, forces = _band(rng, n_img=4)
    pre_vel = -forces.copy()                   # anti-aligned: power < 0
    _quiet(opt.optimize, geoms, forces, pre_vel, 3,
           np.zeros_like(forces), None, np.zeros(4), np.zeros(4), None)
    assert opt.dt == pytest.approx(0.05)
    assert opt.a == pytest.approx(0.1)         # back to a_start
    assert opt.n_reset == 0


def test_fire_neb_live_accelerated_step_is_trapezoid(tmp_path):
    fmod = _ref_module("multioptpy.Optimizer.fire_neb")
    tmod = _ref_module("multioptpy.Optimizer.trust_radius_neb")
    opt = fmod.FIREOptimizer(_fire_cfg(tmp_path, n_reset=0))
    rng = np.random.default_rng(9)
    geoms, forces = _band(rng, n_img=4)
    pre_vel = 0.3 * forces.copy()
    vel = 0.2 * forces.copy()
    got = _quiet(opt.optimize, geoms, forces, pre_vel, 2,
                 vel, None, np.zeros(4), np.zeros(4), None)
    # power>0, n_reset(0) <= 5: dt unchanged (0.1), a unchanged (0.1)
    # per-atom mixing with |F| > 1e-10 everywhere:
    a = 0.1
    mixed = np.empty_like(vel)
    for i in range(vel.shape[0]):
        for j in range(vel.shape[1]):
            fn = np.linalg.norm(forces[i, j])
            vn = np.linalg.norm(vel[i, j])
            mixed[i, j] = (1 - a) * vel[i, j] + a * (vn / fn) * forces[i, j]
    v_new = mixed + 0.1 * forces
    delta = 0.1 * (v_new + pre_vel)            # trapezoid double-count
    tr = tmod.TR_NEB(NEB_FOLDER_DIRECTORY=str(tmp_path) + "/",
                     fix_init_edge=False, fix_end_edge=False,
                     apply_convergence_criteria=False)
    move = _quiet(tr.TR_calc, geoms, forces, delta, np.zeros(4),
                  np.zeros(4), None)
    np.testing.assert_allclose(got, (geoms + move) * B2A, atol=1e-13)


# ==========================================================================
# QuickMin_NEB (quickmin_neb.py)
# ==========================================================================

def test_quickmin_live_first_step_is_mixed_dt_squared():
    mod = _ref_module("multioptpy.Optimizer.quickmin_neb")
    opt = mod.QuickMin_NEB(bohr2angstroms=1.0)
    rng = np.random.default_rng(21)
    geoms, forces = _band(rng, n_img=3)
    energies = np.array([1.0, 2.0, 1.5])
    got = _quiet(opt.QuickMin_NEB_calc, geoms, forces, None, 0,
                 None, None, energies, None, None)
    # velocities init as np.zeros_like(int) 0-d arrays, self-healed by
    # the shape check; first step = dt * (0.9 * dt * F) = 0.9 dt^2 F
    np.testing.assert_allclose(got, geoms + 0.9 * 0.01 * forces,
                               atol=1e-14)
    # stored velocity is 0.9 dt F
    for i in range(3):
        np.testing.assert_allclose(opt.velocities[i],
                                   0.9 * 0.1 * forces[i], atol=1e-14)


def test_quickmin_live_energy_rise_resets_velocity_after_step():
    mod = _ref_module("multioptpy.Optimizer.quickmin_neb")
    opt = mod.QuickMin_NEB(bohr2angstroms=1.0, velocity_mixing=1.0)
    rng = np.random.default_rng(22)
    geoms, forces = _band(rng, n_img=3)
    e0 = np.array([1.0, 2.0, 1.5])
    g1 = _quiet(opt.QuickMin_NEB_calc, geoms, forces, None, 0,
                None, None, e0, None, None)
    v1 = [v.copy() for v in opt.velocities]    # dt F each
    # second call, same forces (v.F > 0), HIGHER energies everywhere
    e_up = e0 + 1.0
    g2 = _quiet(opt.QuickMin_NEB_calc, g1, forces, None, 1,
                None, None, e_up, e0, None)
    # step was computed from the PRE-reset velocity with the OLD dt, and
    # the "projection" is mis-scaled by |F_i|: v = dt F (aligned), so
    # v_par = (v.F) F/|F| = dt |F_i| F, new_v = dt (1 + |F_i|) F,
    # step = dt new_v = dt^2 (1 + |F_i|) F per image
    fnorm = np.linalg.norm(forces.reshape(3, -1), axis=1)
    want = g1 + 0.01 * (1.0 + fnorm)[:, None, None] * forces
    np.testing.assert_allclose(g2, want, atol=1e-13)
    # ...but the STORED velocity was reset to zero and dt halved
    for i in range(3):
        np.testing.assert_allclose(opt.velocities[i], 0.0)
        assert opt.dt_images[i] == pytest.approx(0.05)
    del v1


# ==========================================================================
# AFIRE_NEB (afire_neb.py) vs our afire_step
# ==========================================================================

def test_afire_live_first_step_is_half_dt_squared_vs_our_full():
    mod = _ref_module("multioptpy.Optimizer.afire_neb")
    opt = mod.AFIRE_NEB(bohr2angstroms=1.0)
    rng = np.random.default_rng(31)
    geoms, forces = _band(rng, n_img=3)
    got = _quiet(opt.AFIRE_NEB_calc, geoms, forces, None, 0,
                 None, None, np.zeros(3), None, None)
    # zero velocity -> mixed = v (else branch), new_v = 0.5 dt F,
    # step = dt new_v = 0.5 dt^2 F
    np.testing.assert_allclose(got, geoms + 0.5 * 0.01 * forces,
                               atol=1e-14)

    from multioptpy_tpu.drivers.neb import afire_init, afire_step
    import jax.numpy as jnp
    st = afire_init(3, 3)
    mv, _ = afire_step(st, jnp.asarray(forces), maxstep=10.0)
    # ours: the power=0 first call DECELERATES (dt -> 0.05) and then
    # integrates the full decelerated dt: move = dt_dec^2 F = 0.0025 F
    np.testing.assert_allclose(np.asarray(mv), 0.0025 * forces,
                               atol=1e-12)


def test_afire_live_zero_velocity_fixed_point():
    """From rest the reference NEVER builds velocity: power = F.v = 0 on
    every call takes the reset branch, which overwrites the freshly
    integrated new_v with zeros (:158-164) — stored velocity stays 0 and
    dt decays geometrically by f_dec = 0.5."""
    mod = _ref_module("multioptpy.Optimizer.afire_neb")
    opt = mod.AFIRE_NEB(bohr2angstroms=1.0, maxstep=1e9)
    rng = np.random.default_rng(33)
    geoms, forces = _band(rng, n_img=3)
    forces = 1e-4 * forces
    g = geoms
    ref_dt_trace = []
    for it in range(5):
        g = _quiet(opt.AFIRE_NEB_calc, g, forces, None, it,
                   None, None, np.zeros(3), None, None)
        ref_dt_trace.append(opt.dt_images[0])
    np.testing.assert_allclose(
        ref_dt_trace, [0.05, 0.025, 0.0125, 0.00625, 0.003125],
        atol=1e-15)
    for v in opt.velocities:
        np.testing.assert_allclose(v, 0.0)


def test_afire_live_acceleration_timing_vs_ours():
    """Warm-started (pre_total_velocity aligned with F), the reference
    accelerates on call 6 (n_pos incremented to 6 > n_min=5 BEFORE the
    check, :153-154). Ours, from rest, first accelerates on call 8:
    call 1 is the power=0 deceleration, n_good counts COMPLETED downhill
    calls and the gate checks before incrementing."""
    mod = _ref_module("multioptpy.Optimizer.afire_neb")
    opt = mod.AFIRE_NEB(bohr2angstroms=1.0, maxstep=1e9)
    rng = np.random.default_rng(33)
    geoms, forces = _band(rng, n_img=3)
    forces = 1e-4 * forces
    g = geoms
    ref_dt_trace = []
    for it in range(7):
        g = _quiet(opt.AFIRE_NEB_calc, g, forces, 0.1 * forces, it,
                   None, None, np.zeros(3), None, None)
        ref_dt_trace.append(opt.dt_images[0])
    assert all(d == pytest.approx(0.1) for d in ref_dt_trace[:5])
    assert ref_dt_trace[5] == pytest.approx(0.11)
    assert ref_dt_trace[6] == pytest.approx(0.121)

    from multioptpy_tpu.drivers.neb import afire_init, afire_step
    import jax.numpy as jnp
    st = afire_init(3, 3)
    our_dt_trace = []
    f = jnp.asarray(forces)
    for _ in range(10):
        _, st = afire_step(st, f, maxstep=1e9)
        our_dt_trace.append(float(st.dt[0]))
    assert our_dt_trace[:7] == pytest.approx([0.05] * 7)
    assert our_dt_trace[7] == pytest.approx(0.055)
    assert our_dt_trace[8] == pytest.approx(0.0605)
