"""LIVE parity wave 24: the Growing Newton Trajectory engine
(OtherMethod/newton_traj.py) — the reference's predictor/corrector code
executed on shared analytic PESs, side by side with our
drivers/newton_traj.py.

Conventions learned by execution (ref: OtherMethod/newton_traj.py):

  * `get_r(cur, final)` (:46-69) runs Calculationtools.kabsch_algorithm,
    which CENTERS BOTH INPUT ARRAYS IN PLACE (calc_tools.py:412-424:
    `P -= centroid_P` before the rotated copy is made). Executed
    consequence: `initialize` in two-file mode silently translates the
    caller's geometry (and the product geometry) to the centroid frame
    before growing — pinned.
  * `get_r(cur)` with gnt_vec "i,j" builds r[i-1] = x_j - x_i and
    r[j-1] = x_i - x_j (1-indexed), then normalizes the WHOLE flat
    vector: a +step along r CONTRACTS the pair by sqrt(2)*step_len —
    pinned on a 2-atom system.
  * Two-file mode CANNOT grow: reparametrize's direction-refresh calls
    `self.get_r(geom)` with no final_geom (:282), which raises
    ValueError("Need to specify either final_geom or gnt_vec") whenever
    the frontier is converged and gnt_vec is None — the documented
    double-ended mode crashes at its FIRST growth step (pinned with
    pytest.raises). Only gnt_vec mode is operable.
  * `optimize_frontier_image` (:158-244) does BFGS on "forces" that are
    in fact GRADIENTS for every standard Calculation engine (same
    naming defect as dimer.py, wave 17). Executed consequences on a
    convex quadratic:
      - the curvature gate `s.y > 1e-10` with y = pf_prev - pf_cur =
        -P dg is ALWAYS NEGATIVE for gradient input, so the inverse
        Hessian stays the identity forever: the "BFGS" frontier
        optimizer is exactly projected steepest descent with a 0.02
        Bohr trust clamp — pinned by replicating the whole micro-loop
        with H_inv = I to 1e-12;
      - feeding a true force engine (-g) makes every step an ASCENT
        direction (search_dir = +H_inv P g): energy strictly increases
        — pinned.
  * Stationary-point bookkeeping is off by one image: images[] lags
    energies[] (initialize appends the seed geometry twice, grow_image
    appends the PRE-step geometry while recording the POST-step
    energy), so the recorded sp_image when `passed_ts` fires is one
    predictor step BEHIND the energy-max geometry — pinned on a
    double-well bond PES (recorded TS bond = true max bond +
    sqrt(2)*step_len).
  * Our drivers/newton_traj.newton_trajectory on the same PES and the
    same direction vector localizes the energy maximum at the true
    barrier (|b_TS - 1.5| < bond step), with no off-by-one.

Ref anchors: OtherMethod/newton_traj.py:46-74 (get_r/projector),
:76-118 (grow_image), :158-244 (frontier BFGS), :246-315
(reparametrize), :344-454 (main); Utils/calc_tools.py:412-424 (in-place
Kabsch); drivers/newton_traj.py (ours).
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


def _bohr2ang():
    return _ref_module("multioptpy.Parameters.unit_values") \
        .UnitValueLib().bohr2angstroms


class _Cfg:
    """Minimal config namespace for NewtonTrajectory."""

    def __init__(self, tmp_path, gnt_vec=None, step_len=0.05,
                 rms_thresh=1e-3, microiter=8):
        self.gnt_step_len = step_len
        self.gnt_rms_thresh = rms_thresh
        self.gnt_vec = gnt_vec
        self.gnt_microiter = microiter
        self.iEIP_FOLDER_DIRECTORY = str(tmp_path) + "/"
        self.bohr2angstroms = _bohr2ang()
        self.hartree2kcalmol = 627.509
        self.microiterlimit = 200
        self.force_data = {"xtb": "GFN2-xTB"}
        os.makedirs(self.iEIP_FOLDER_DIRECTORY, exist_ok=True)


class _FIO:
    """Captures the geometry the engine writes 'to disk' (Å + element
    column + charge/mult header) and exposes it to the fake SP."""

    def __init__(self, holder, b2a):
        self.holder = holder
        self.b2a = b2a

    def make_psi4_input_file(self, geom_list, iter_num):
        rows = geom_list[0][1:]            # drop charge/mult header
        ang = np.array([[float(v) for v in row[1:]] for row in rows])
        self.holder["geom"] = ang / self.b2a   # back to Bohr
        return f"fake_dir_{iter_num}"


class _SP:
    """single_point evaluating an analytic PES at the holder geometry.

    Returns the GRADIENT in the 'forces' slot (the standard Calculation
    engine contract, e.g. tblite_calculation_tools.py:162); sign=-1
    turns it into a true force engine.
    """

    def __init__(self, holder, efunc, gfunc, sign=1.0):
        self.holder = holder
        self.efunc = efunc
        self.gfunc = gfunc
        self.sign = sign

    def single_point(self, file_directory, element_list, iter_num,
                     charge_mult, method):
        x = np.asarray(self.holder["geom"], float)
        return (float(self.efunc(x)), self.sign * np.asarray(self.gfunc(x)),
                x.copy(), False)


def _make_nt(tmp_path, **kw):
    nt_mod = _ref_module("multioptpy.OtherMethod.newton_traj")
    return nt_mod.NewtonTrajectory(_Cfg(tmp_path, **kw))


# ---------------------------------------------------------------- PESs

def _doublewell():
    """2-atom PES: E = ((b-1.5)^2 - 0.25)^2, minima b=1,2, TS b=1.5."""

    def e(x):
        b = np.linalg.norm(x[1] - x[0])
        return ((b - 1.5) ** 2 - 0.25) ** 2

    def g(x):
        b = np.linalg.norm(x[1] - x[0])
        dEdb = 2.0 * ((b - 1.5) ** 2 - 0.25) * 2.0 * (b - 1.5)
        u = (x[1] - x[0]) / b
        gr = np.zeros_like(x)
        gr[0] = -dEdb * u
        gr[1] = dEdb * u
        return gr

    return e, g


def _quad(Hdiag):
    H = np.diag(Hdiag)

    def e(x):
        v = x.reshape(-1)
        return 0.5 * v @ H @ v

    def g(x):
        return (H @ x.reshape(-1)).reshape(x.shape)

    return e, g


# --------------------------------------------------------------- tests

def test_get_r_gnt_vec_contracts_the_pair(tmp_path):
    nt = _make_nt(tmp_path, gnt_vec="1,2")
    geom = np.array([[0.0, 0.0, 0.0], [2.1, 0.0, 0.0]])
    r = nt.get_r(geom.copy())
    # r[0] points 0->1, r[1] points 1->0, whole flat vector normalized
    expect = np.array([[2.1, 0, 0], [-2.1, 0, 0]])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(r, expect, atol=1e-14)
    # a +step along r shrinks the bond by sqrt(2)*step
    step = 0.05
    b_new = np.linalg.norm((geom + step * r)[1] - (geom + step * r)[0])
    assert abs((2.1 - b_new) - np.sqrt(2) * step) < 1e-12


def test_get_r_final_geom_centers_inputs_in_place(tmp_path):
    nt = _make_nt(tmp_path)
    rng = np.random.default_rng(7)
    cur = rng.normal(size=(3, 3)) + 5.0      # well off-center
    fin = rng.normal(size=(3, 3)) + 5.0
    cur_orig, fin_orig = cur.copy(), fin.copy()
    r = nt.get_r(cur, fin)
    # in-place mutation: both arrays lost their centroid
    np.testing.assert_allclose(cur, cur_orig - cur_orig.mean(0), atol=1e-12)
    np.testing.assert_allclose(fin, fin_orig - fin_orig.mean(0), atol=1e-12)
    assert abs(np.linalg.norm(r) - 1.0) < 1e-12
    # r is the normalized (centered final - rotated centered current)
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    P, Q = ct.kabsch_algorithm(cur_orig.copy(), fin_orig.copy())
    expect = Q - P
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(r, expect, atol=1e-12)


def test_projector(tmp_path):
    nt = _make_nt(tmp_path, gnt_vec="1,2")
    r = np.zeros((2, 3))
    r[0, 0] = 1.0
    P = nt.calc_projector(r)
    np.testing.assert_allclose(P, np.eye(6) - np.outer(r.reshape(-1),
                                                       r.reshape(-1)),
                               atol=1e-15)


def test_two_file_mode_crashes_on_first_growth(tmp_path):
    """reparametrize -> get_r(geom) with neither final_geom nor gnt_vec."""
    nt = _make_nt(tmp_path, rms_thresh=1e-3)
    holder = {"geom": None}
    e, g = _doublewell()
    sp = _SP(holder, e, g)
    fio = _FIO(holder, nt.config.bohr2angstroms)
    cur = np.array([[0.0, 0.0, 0.0], [2.1, 0.0, 0.0]])
    fin = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    holder["geom"] = cur
    with contextlib.redirect_stdout(io.StringIO()):
        geom, fdir, err = nt.initialize(sp, fio, cur.copy(), ["H", "H"],
                                        [0, 1], "d0", final_geom=fin.copy())
    assert not err
    # frontier is converged (gradient purely along r on this PES) ->
    # growth branch -> direction refresh -> ValueError
    with pytest.raises(ValueError, match="final_geom or gnt_vec"), \
            contextlib.redirect_stdout(io.StringIO()):
        nt.reparametrize(sp, fio, geom, ["H", "H"], [0, 1], 1, fdir)


def test_frontier_bfgs_is_dead_projected_sd(tmp_path):
    """Gradient-convention engine: curvature gate always fails, H_inv
    stays I -> the micro-loop is exactly trust-clamped projected SD."""
    nt = _make_nt(tmp_path, rms_thresh=1e-12, microiter=8)
    r = np.zeros(6)
    r[0] = 1.0
    nt.r = r.reshape(2, 3)
    nt.P = np.eye(6) - np.outer(r, r)
    holder = {"geom": None}
    e, g = _quad([1.0, 0.7, 0.4, 1.3, 2.0, 0.9])
    sp = _SP(holder, e, g)
    fio = _FIO(holder, nt.config.bohr2angstroms)
    x0 = np.array([[0.3, -0.4, 0.5], [-0.2, 0.6, -0.3]])
    holder["geom"] = x0.copy()
    with contextlib.redirect_stdout(io.StringIO()):
        _, _, got, err, _ = nt.optimize_frontier_image(
            sp, fio, x0.copy(), ["H", "H"], [0, 1], 1, "d0")
    assert not err

    # numpy replica with H_inv = I forever
    H = np.diag([1.0, 0.7, 0.4, 1.3, 2.0, 0.9])
    P = nt.P
    x = x0.reshape(-1).copy()
    sy_seen = []
    prev_x = prev_pf = None
    for _ in range(8):
        pf = P @ (H @ x)
        if prev_x is not None:
            sy_seen.append(np.dot(x - prev_x, prev_pf - pf))
        prev_x, prev_pf = x.copy(), pf.copy()
        d = -pf
        n = np.linalg.norm(d)
        if n > 0.02:
            d *= 0.02 / n
        x = x + d
    np.testing.assert_allclose(got.reshape(-1), x, atol=1e-12)
    # and the reason: every curvature product was negative
    assert sy_seen and max(sy_seen) < 0


def test_frontier_with_true_force_engine_ascends(tmp_path):
    nt = _make_nt(tmp_path, rms_thresh=1e-12, microiter=8)
    r = np.zeros(6)
    r[0] = 1.0
    nt.r = r.reshape(2, 3)
    nt.P = np.eye(6) - np.outer(r, r)
    holder = {"geom": None}
    e, g = _quad([1.0, 0.7, 0.4, 1.3, 2.0, 0.9])
    sp = _SP(holder, e, g, sign=-1.0)      # returns -gradient
    fio = _FIO(holder, nt.config.bohr2angstroms)
    x0 = np.array([[0.3, -0.4, 0.5], [-0.2, 0.6, -0.3]])
    holder["geom"] = x0.copy()
    with contextlib.redirect_stdout(io.StringIO()):
        efin, _, got, err, _ = nt.optimize_frontier_image(
            sp, fio, x0.copy(), ["H", "H"], [0, 1], 1, "d0")
    assert not err
    assert efin > e(x0)          # walked uphill
    assert np.linalg.norm(got - x0) > 0.02  # it did move


def test_growth_walk_and_offbyone_ts_image(tmp_path):
    """Full gnt_vec walk across the double well: passed_ts fires, and
    the recorded sp_image is one predictor step behind the max."""
    step = 0.05
    nt = _make_nt(tmp_path, gnt_vec="1,2", step_len=step, rms_thresh=1e-3)
    holder = {"geom": None}
    e, g = _doublewell()
    sp = _SP(holder, e, g)
    fio = _FIO(holder, nt.config.bohr2angstroms)
    cur = np.array([[0.0, 0.0, 0.0], [2.1, 0.0, 0.0]])
    holder["geom"] = cur
    with contextlib.redirect_stdout(io.StringIO()):
        geom, fdir, err = nt.initialize(sp, fio, cur.copy(), ["H", "H"],
                                        [0, 1], "d0")
    assert not err
    for it in range(1, 60):
        with contextlib.redirect_stdout(io.StringIO()):
            geom, err, fdir = nt.reparametrize(sp, fio, geom, ["H", "H"],
                                               [0, 1], it, fdir)
        assert not err
        if nt.ts_images:
            break
    assert nt.ts_images, "never passed the TS"

    bond = lambda x: np.linalg.norm(np.asarray(x)[1] - np.asarray(x)[0])
    bstep = np.sqrt(2) * step
    energies = np.asarray(nt.all_energies)
    # energies[k] = E at bond 2.1 - k*bstep; true max at b=1.5
    k_max = int(np.argmax(energies))
    b_max = 2.1 - k_max * bstep
    assert abs(b_max - 1.5) <= bstep / 2 + 1e-9
    # the recorded TS image is one predictor step behind the max
    assert abs(bond(nt.ts_images[0]) - (b_max + bstep)) < 1e-9


def test_our_gnt_finds_the_true_barrier():
    from multioptpy_tpu.drivers.newton_traj import (GNTConfig,
                                                    newton_trajectory)

    class _PES:
        def energy_and_gradient(self, x, z):
            b = jnp.linalg.norm(x[1] - x[0])
            e = ((b - 1.5) ** 2 - 0.25) ** 2
            g = jax.grad(lambda xx: ((jnp.linalg.norm(xx[1] - xx[0])
                                      - 1.5) ** 2 - 0.25) ** 2)(x)
            return e, g

    x0 = jnp.array([[0.0, 0.0, 0.0], [2.1, 0.0, 0.0]])
    r = jnp.array([[1.0, 0, 0], [-1.0, 0, 0]])
    r = r / jnp.linalg.norm(r)
    res = newton_trajectory(_PES(), x0, jnp.array([1, 1]), direction=r,
                            config=GNTConfig(step_size=0.05, n_steps=40,
                                             n_corrector=5))
    b_ts = float(jnp.linalg.norm(res.ts_guess[1] - res.ts_guess[0]))
    # no off-by-one: the reported TS is the energy-max point itself,
    # within one bond step of the true barrier
    assert abs(b_ts - 1.5) <= np.sqrt(2) * 0.05 / 2 + 1e-9
