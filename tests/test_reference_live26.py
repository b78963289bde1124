"""LIVE parity wave 26: the remaining IRC integrators — HPC (Hessian
predictor-corrector on a DWI surface) and ModeKill — the reference's own
classes executed on shared analytic fields, side by side with our
make_irc_step('hpc') kernel and mode-removal conventions.

Conventions learned by execution (ref: IRC/hpc.py, IRC/modekill.py):

  * DWISurface (hpc.py:16-114) is the two-point distance-weighted
    interpolant of Hratchian & Schlegel: w1 = |dx2|^2/(|dx1|^2+|dx2|^2),
    E = w1 T1 + w2 T2 — pinned exactly, and its analytic gradient
    matches central differences of its own energy to 1e-7 (the weight-
    gradient calculus is correct upstream).
  * corrector_step (hpc.py:117-140) is plain normalized-gradient Euler
    with h = total_s/n_steps and a 1e-9 early exit — pinned exactly.
  * HPC.step (hpc.py:278-335) is the LQA predictor with |w| < 1e-8
    eigendrop, arc-length Euler quadrature over N_euler=20000 substeps
    of dt = step/(N max(|g|,1e-6)), expm1-stabilized coefficients, and a
    mass-weighted-COM recentre — replicated to 1e-12.
  * HPC.run keeps NON-mass-weighted bias-inclusive data in prev_data and
    mass-weights per iteration; the corrected point's energy/gradient
    for the next cycle come from the DWI SURFACE, not a new QM call
    (hpc.py:475-489) — there is exactly ONE QM call per HPC cycle,
    pinned via the engine call counter (max_step-1 predictor calls + 1
    init).
  * ModeKill.eigval_to_wavenumber uses sign(w)*sqrt(|w|)*5140.48678
    (modekill.py:271-289); 5140.48678 is the textbook
    sqrt(Eh/(amu a0^2))/(2 pi c) conversion, matching our
    analysis/vibrations constant to 5 significant figures.
  * update_mw_down_step (modekill.py:291-388): first call verifies
    kill_inds are imaginary, stores the eigenvector set, flips each
    kill mode so its overlap with the NORMALIZED mass-weighted bias
    gradient is negative, and sets mw_down_step = step_size *
    sum(kill_modes) — pinned exactly on a synthetic spectrum. Later
    calls re-identify each tracked mode by maximum |overlap| against
    the previous eigenvectors RESTRICTED to currently-negative modes
    (ovlp_thresh = 0.3); when every tracked mode has healed positive,
    converged flips True — both branches pinned.
  * kill_inds=[] converges immediately; out-of-range kill_inds take the
    IndexError fallback onto all currently-negative modes (pinned).
  * ModeKill.run's default-mode policy (kill_inds=None) keeps the FIRST
    imaginary mode (the IRC mode) and targets neg_inds[1:]
    (modekill.py:436-449) — pinned on a stretched LJ cluster with >= 2
    imaginary modes via a 0-step run. NOTE the variable named
    mw_hessian holds the UN-mass-weighted QM Hessian throughout
    (assigned raw from CE.Model_hess, :419-424); for heavy atoms the
    "wavenumbers" it prints are scaled by 1/sqrt(m) relative to truth.

Ref anchors: IRC/hpc.py:16-140 (DWI + corrector), :278-335 (step),
:337-563 (run); IRC/modekill.py:271-560; drivers/irc.py:155 (ours).
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

_A2B = 1.8897261254578281


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


class _StubGraph:
    def __init__(self, *a, **k):
        pass

    def single_plot(self, *a, **k):
        pass


class _LJEngine:
    """tblite-contract engine over our pure-JAX LJ (coords in Å in,
    atomic units out), with Model_hess support for ModeKill."""

    def __init__(self, calc, z):
        self.calc = calc
        self.z = z
        self.n_calls = 0
        self.hessian_flag = False
        self.Model_hess = None

    def single_point(self, fdir, el, it, ecm, method, geom_ang):
        coords = jnp.asarray(np.asarray(geom_ang) * _A2B)
        e, g = self.calc.energy_and_gradient(coords, self.z)
        self.n_calls += 1
        if self.hessian_flag:
            self.Model_hess = np.asarray(self.calc.hessian(coords, self.z))
        return float(e), np.asarray(g), np.asarray(coords), False


def _ar4_fixture():
    from multioptpy_tpu.calculators import LennardJones

    rmin = 7.1
    coords = np.array([[0.0, 0.0, 0.0], [rmin, 0.0, 0.0],
                       [0.3, rmin, 0.0], [rmin * 0.4, rmin * 0.5, rmin]])
    rng = np.random.default_rng(260)
    coords += 0.25 * rng.standard_normal(coords.shape)
    coords -= coords.mean(axis=0)
    z = jnp.array([18] * 4)
    from multioptpy_tpu.calculators import LennardJones as _LJ
    return _LJ(), coords, z


# ------------------------------------------------------------------ DWI

def _random_point_data(rng, n):
    x = rng.normal(size=(n, 3))
    e = float(rng.normal())
    g = rng.normal(size=(n, 3))
    h = rng.normal(size=(3 * n, 3 * n))
    h = 0.5 * (h + h.T)
    return x, e, g, h


def test_dwi_surface_exact_and_grad_consistent():
    hpc_mod = _ref_module("multioptpy.IRC.hpc")
    rng = np.random.default_rng(1)
    x1, e1, g1, h1 = _random_point_data(rng, 3)
    x2, e2, g2, h2 = _random_point_data(rng, 3)
    dwi = hpc_mod.DWISurface(x1, e1, g1, h1, x2, e2, g2, h2)

    xq = (0.3 * x1 + 0.7 * x2 + 0.1 * rng.normal(size=x1.shape)).reshape(-1)

    def taylor(i, xf):
        xi = [x1, x2][i].reshape(-1)
        gi = [g1, g2][i].reshape(-1)
        hi = [h1, h2][i]
        dx = xf - xi
        return [e1, e2][i] + gi @ dx + 0.5 * dx @ hi @ dx

    n1 = np.sum((xq - x1.reshape(-1)) ** 2)
    n2 = np.sum((xq - x2.reshape(-1)) ** 2)
    w1, w2 = n2 / (n1 + n2), n1 / (n1 + n2)
    expect_e = w1 * taylor(0, xq) + w2 * taylor(1, xq)
    np.testing.assert_allclose(dwi.get_energy(xq), expect_e, rtol=1e-12)

    # analytic gradient == FD of its own energy
    g_ana = dwi.get_gradient(xq).reshape(-1)
    g_fd = np.zeros_like(g_ana)
    h = 1e-6
    for k in range(len(xq)):
        xp, xm = xq.copy(), xq.copy()
        xp[k] += h
        xm[k] -= h
        g_fd[k] = (dwi.get_energy(xp) - dwi.get_energy(xm)) / (2 * h)
    np.testing.assert_allclose(g_ana, g_fd, atol=1e-6)

    # weights at the data points and midway
    assert dwi.get_weights(x1.reshape(-1)) == (1.0, 0.0)
    w = dwi.get_weights(x1.reshape(-1))
    assert w[0] + w[1] == 1.0


def test_corrector_step_exact_replica():
    hpc_mod = _ref_module("multioptpy.IRC.hpc")
    rng = np.random.default_rng(2)
    x1, e1, g1, h1 = _random_point_data(rng, 2)
    x2, e2, g2, h2 = _random_point_data(rng, 2)
    # make both Hessians PSD so the walk is tame
    h1 = h1 @ h1.T + np.eye(6)
    h2 = h2 @ h2.T + np.eye(6)
    dwi = hpc_mod.DWISurface(x1, e1, g1, h1, x2, e2, g2, h2)

    got = hpc_mod.corrector_step(dwi, x1.copy(), 0.3, n_steps=25)

    x = x1.copy()
    h = 0.3 / 25
    for _ in range(25):
        g = dwi.get_gradient(x.reshape(-1)).reshape(-1)
        ng = np.linalg.norm(g)
        if ng < 1e-9:
            break
        x = x + (-(g / ng) * h).reshape(2, 3)
    np.testing.assert_allclose(got, x, atol=1e-12)


# ------------------------------------------------------------------ HPC

def _make_hpc(tmp_path, calc, coords, z, max_step, step_size,
              init_hess=None):
    mod = _ref_module("multioptpy.IRC.hpc")
    mod.Graph = _StubGraph
    wd = str(tmp_path) + "/"
    os.makedirs(wd, exist_ok=True)
    engine = _LJEngine(calc, z)
    obj = mod.HPC(["Ar"] * len(coords), [0, 1], 99999, wd, wd,
                  _empty_force_data(), max_step=max_step,
                  step_size=step_size, init_coord=coords.copy(),
                  init_hess=init_hess, calc_engine=engine,
                  xtb_method=None)
    return obj, engine


def test_hpc_step_exact_replica(tmp_path):
    calc, coords, z = _ar4_fixture()
    obj, _ = _make_hpc(tmp_path, calc, coords, z, 3, 0.05)
    _, sqrt_m, _, sqrt_m3 = obj.get_mass_array()

    e, g = calc.energy_and_gradient(jnp.asarray(coords), z)
    h = np.asarray(calc.hessian(jnp.asarray(coords), z))
    mw_h = h / np.asarray(sqrt_m3)[:, None] / np.asarray(sqrt_m3)[None, :]
    mw_g = np.asarray(g) / np.asarray(sqrt_m)[:, None]

    got = obj.step(mw_g.copy(), coords.copy(), mw_h.copy(), sqrt_m)

    # replica
    w, v = np.linalg.eigh(mw_h)
    keep = ~(np.abs(w) < 1e-8)
    w, v = w[keep], v[:, keep]
    gf = mw_g.reshape(-1)
    dt = 1 / 20000 * 0.05 / max(np.linalg.norm(gf), 1e-6)
    gp = v.T @ gf
    t, length = dt, 0.0
    for _ in range(20000):
        dsdt = np.sqrt(np.sum(gp ** 2 * np.exp(-2 * w * t)))
        length += dsdt * dt
        if length > 0.05:
            break
        t += dt
    x = -w * t
    alphas = np.where(np.abs(x) < 1e-8, -t, np.expm1(x) / w)
    step = (v @ (np.diag(alphas) @ (v.T @ gf))).reshape(-1, 3)
    step = step / np.asarray(sqrt_m)[:, None]
    new = coords + step
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    new = new - ct.calc_center_of_mass(new, ["Ar"] * 4)
    np.testing.assert_allclose(got, new, atol=1e-12)


def test_hpc_full_run_descends_one_qm_call_per_cycle(tmp_path):
    calc, coords, z = _ar4_fixture()
    h0 = np.asarray(calc.hessian(jnp.asarray(coords), z))
    max_step = 6
    obj, engine = _make_hpc(tmp_path, calc, coords, z, max_step, 0.04,
                            init_hess=h0)
    with contextlib.redirect_stdout(io.StringIO()):
        obj.run()
    # exactly 1 init + (max_step-1) predictor calls
    assert engine.n_calls == max_step

    # corrected path descends on the true PES
    frames = []
    with open(obj.xyz_filename) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        n = int(lines[i])
        frames.append(np.array([[float(x) for x in ln.split()[1:4]]
                                for ln in lines[i + 2:i + 2 + n]]) * _A2B)
        i += 2 + n
    assert len(frames) == max_step
    es = [float(calc.energy_and_gradient(jnp.asarray(fr), z)[0])
          for fr in frames]
    assert es[-1] < es[0]
    assert all(es[k + 1] <= es[k] + 1e-6 for k in range(len(es) - 1))

    # our hpc kernel's first step points the same way
    from multioptpy_tpu.drivers.irc import IRCConfig, make_irc_step
    step = make_irc_step(calc, z, IRCConfig(method="hpc", step_size=0.04))
    ours1, _, _ = step(jnp.asarray(coords))
    d_ref = (frames[1] - frames[0]).reshape(-1)
    d_our = np.asarray(ours1 - coords).reshape(-1)
    cos = d_ref @ d_our / (np.linalg.norm(d_ref) * np.linalg.norm(d_our))
    assert cos > 0.9


# -------------------------------------------------------------- ModeKill

def _make_mk(tmp_path, calc, coords, z, **kw):
    mod = _ref_module("multioptpy.IRC.modekill")
    mod.Graph = _StubGraph
    wd = str(tmp_path) + "/"
    os.makedirs(wd, exist_ok=True)
    engine = _LJEngine(calc, z)
    obj = mod.ModeKill(["Ar"] * len(coords), [0, 1], 99999, wd, wd,
                       _empty_force_data(), init_coord=coords.copy(),
                       calc_engine=engine, xtb_method=None, do_hess=False,
                       **kw)
    return obj, engine


def test_eigval_to_wavenumber_constant(tmp_path):
    calc, coords, z = _ar4_fixture()
    obj, _ = _make_mk(tmp_path, calc, coords, z, kill_inds=[0])
    w = np.array([-0.04, 0.0, 0.09])
    got = obj.eigval_to_wavenumber(w)
    np.testing.assert_allclose(got, np.sign(w) * np.sqrt(np.abs(w))
                               * 5140.48678, rtol=0)
    # the constant is sqrt(Eh/(amu a0^2)) / (2 pi c) to 5 significant
    # figures (textbook conversion used by our vibrational analysis)
    HARTREE = 4.3597447222071e-18
    AMU = 1.66053906660e-27
    BOHR = 0.529177210903e-10
    C = 29979245800.0  # cm/s
    exact = np.sqrt(HARTREE / (AMU * BOHR ** 2)) / (2 * np.pi * C)
    assert abs(exact - 5140.48678) / exact < 2e-6


def _synthetic_spectrum(rng, neg=(-0.5, -0.2), pos=(0.3, 0.6, 0.9, 1.2)):
    lam = np.array(list(neg) + list(pos))
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    return q @ np.diag(lam) @ q.T, lam, q


def test_update_mw_down_step_init_exact(tmp_path):
    calc, coords, z = _ar4_fixture()
    obj, _ = _make_mk(tmp_path, calc, coords, z, kill_inds=np.array([1]),
                      step_size=0.1)
    rng = np.random.default_rng(26)
    h, lam, _ = _synthetic_spectrum(rng)
    obj.mw_hessian = h
    grad = rng.normal(size=6)
    with contextlib.redirect_stdout(io.StringIO()):
        obj.update_mw_down_step(None, grad.copy())
    assert not obj.converged

    w, v = np.linalg.eigh(h)
    mode = v[:, 1].copy()
    gn = grad / np.linalg.norm(grad)
    if mode @ gn > 0:
        mode = -mode
    np.testing.assert_allclose(obj.kill_modes[:, 0], mode, atol=1e-12)
    np.testing.assert_allclose(obj.mw_down_step, 0.1 * mode, atol=1e-12)


def test_update_mw_down_step_tracking_and_heal(tmp_path):
    calc, coords, z = _ar4_fixture()
    obj, _ = _make_mk(tmp_path, calc, coords, z, kill_inds=np.array([1]),
                      step_size=0.1)
    rng = np.random.default_rng(27)
    h, lam, q = _synthetic_spectrum(rng)
    obj.mw_hessian = h
    grad = rng.normal(size=6)
    with contextlib.redirect_stdout(io.StringIO()):
        obj.update_mw_down_step(None, grad.copy())

    # rotate the spectrum slightly: the tracked mode stays negative and
    # is re-identified by overlap
    w, v = np.linalg.eigh(h)
    theta = 0.05
    r = np.eye(6)
    r[2, 2] = r[3, 3] = np.cos(theta)
    r[2, 3], r[3, 2] = -np.sin(theta), np.sin(theta)
    v2 = v @ r.T
    h2 = v2 @ np.diag(w) @ v2.T
    obj.mw_hessian = h2
    with contextlib.redirect_stdout(io.StringIO()):
        obj.update_mw_down_step(None, grad.copy())
    assert not obj.converged
    assert list(obj.kill_inds) == [1]

    # heal the tracked mode (make it +0.4): nothing imaginary overlaps
    # it any more -> converged
    w3 = w.copy()
    w3[1] = 0.4
    obj.mw_hessian = v2 @ np.diag(w3) @ v2.T
    with contextlib.redirect_stdout(io.StringIO()):
        obj.update_mw_down_step(None, grad.copy())
    assert obj.converged


def test_update_mw_down_step_edge_cases(tmp_path):
    calc, coords, z = _ar4_fixture()
    rng = np.random.default_rng(28)
    h, _, _ = _synthetic_spectrum(rng)

    # empty kill list -> converged immediately
    obj, _ = _make_mk(tmp_path, calc, coords, z,
                      kill_inds=np.array([], dtype=int))
    obj.mw_hessian = h
    with contextlib.redirect_stdout(io.StringIO()):
        obj.update_mw_down_step(None, rng.normal(size=6))
    assert obj.converged

    # out-of-range indices -> IndexError fallback to all negative modes
    obj2, _ = _make_mk(tmp_path, calc, coords, z,
                       kill_inds=np.array([50]))
    obj2.mw_hessian = h
    with contextlib.redirect_stdout(io.StringIO()):
        obj2.update_mw_down_step(None, rng.normal(size=6))
    assert not obj2.converged
    assert sorted(obj2.kill_inds) == [0, 1]


def test_modekill_default_policy_keeps_first_imaginary(tmp_path):
    """run() with kill_inds=None on a squeezed LJ cluster: targets
    neg_inds[1:], keeping the softest imaginary mode as the IRC mode."""
    from multioptpy_tpu.calculators import LennardJones

    calc = LennardJones()
    rmin = 7.1
    # square-planar Ar4: a second-order saddle (two imaginary
    # out-of-plane/rhombus modes vs the tetrahedral minimum)
    coords = np.array([[0.0, 0.0, 0.0], [rmin, 0.0, 0.0],
                       [rmin, rmin, 0.0], [0.0, rmin, 0.0]])
    coords -= coords.mean(axis=0)
    z = jnp.array([18] * 4)
    obj, engine = _make_mk(tmp_path, calc, coords, z, kill_inds=None,
                           max_step=0)
    obj.mw_hessian = None
    with contextlib.redirect_stdout(io.StringIO()):
        obj.run()

    # replica of the policy on the same (projected, un-mass-weighted)
    # Hessian
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    h = np.asarray(calc.hessian(jnp.asarray(coords), z))
    hp = ct.project_out_hess_tr_and_rot(h, ["Ar"] * 4, coords)
    w, _ = np.linalg.eigh(hp)
    nus = np.sign(w) * np.sqrt(np.abs(w)) * 5140.48678
    neg = np.where(nus < -5.0)[0]
    assert len(neg) >= 2, "fixture must have >= 2 imaginary modes"
    assert list(obj.kill_inds) == list(neg[1:])
