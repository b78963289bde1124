"""LIVE parity wave 29: DIC_RSIRFO — the reference's delocalized-internal-
coordinate optimizer (Baker 1996) executed side by side with our internals
machinery and the dic_rsirfo driver path.

Conventions learned by execution (ref: Optimizer/dic_rsirfo.py):

  * The primitive set is ALL-PAIRS STRETCHES ONLY: _build_primitive_B_bends
    and _build_primitive_B_torsions are TODO stubs returning (0, 3N)
    (dic_rsirfo.py:42-60 print "not implemented") — despite the
    docstring's Baker/Kessi/Delley citation, no bend or torsion
    primitive exists upstream. On water the primitive B is exactly the
    3 pair stretches and matches our b_matrix rows (same (ri-rj)/r sign
    convention, same (i,j) enumeration order) to 1e-14. Ours builds
    real bend/torsion/linear-bend primitives (coords/internals.py).
  * The active subspace is the eigvecs of G = B B^T above g_tol=1e-6;
    water gives k = 3 = 3N-6. Gradient transform g_q = Lambda^-1 U^T B
    g_x, step back-transform dx = B^T U Lambda^-1 dq, Hessian
    H_q = T H T^dagger — all pinned executed; the forward-differential
    consistency (U^T B) dx = dq holds to machine precision.
  * The one-step DIC-RFO move is BASIS-INVARIANT in exact arithmetic:
    T^dagger (T H T^dagger)^-1 T = B^T (B H B^T)^+ B. Pinned: the
    reference's Newton composition equals the pinv formula on OUR
    b_matrix to 1e-15 — their DIC pipeline and our internals produce
    the same Cartesian Newton step over the same primitive set.
  * The full run() step is replicated term for term (projector for
    saddle_order=0 is identity since roots = range(0); eigendecompose
    H_q; filter |eig| < 1e-6; plain RFO in the filtered basis;
    back-transform) to 1e-15, and the returned move carries ZERO net
    translation and rotation (stretch-only DIC cannot move TR/rot) —
    the reference never needs TR/rot projection here.
  * QUIRK: the coordinate system is built ONCE at the first geometry
    and NEVER rebuilt (dic_rsirfo.py:276 "Build coordinate system only
    on the first step") — B_prim is frozen for the entire optimization,
    a linearization around the start point. Ours rebuilds B every step
    (drivers/optimize.py dic_move).
  * DEFECT (shared with RSIRFO, see wave 27): solve_rfo
    (dic_rsirfo.py:982-1000) divides the gradient by alpha TWICE, so
    the restricted-step alpha is a no-op — |step| is alpha-invariant.
    DIC adds only the 2*trust_radius_max CARTESIAN clamp (:416-420).
  * DEFECT: update_hessian (dic_rsirfo.py:434-455, "P2 Fix") projects
    the secant DISPLACEMENT with the GRADIENT transform T = Lambda^-1
    U^T B instead of the displacement differential U^T B — the secant
    pair fed to BFGS/FSB is mis-scaled by Lambda^-1 (pinned executed:
    the two projections differ by exactly Lambda^-1 on a fixture with
    non-uniform G eigenvalues).
  * saddle_order DEFAULTS TO 1 for DIC (dic_rsirfo.py:205) — unlike
    RSIRFO minimization drivers; trust_radius default 0.5/0.1 by order.

Ref anchors: Optimizer/dic_rsirfo.py:8-196 (InternalCoordinates),
:197-265 (init), :267-433 (run), :434-560 (update), :909-1000 (secular);
ours: coords/internals.py, drivers/optimize.py dic_move.
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


def _build_ic(geom):
    dic_mod = _ref_module("multioptpy.Optimizer.dic_rsirfo")
    with contextlib.redirect_stdout(io.StringIO()):
        ic = dic_mod.InternalCoordinates(log_func=None)
        k = ic.build_active_subspace(geom.ravel())
    return ic, k


def test_dic_primitives_stretch_only_live():
    from multioptpy_tpu.coords.internals import InternalCoordinates as OurIC

    geom, _, _ = _water_fixture()
    dic_mod = _ref_module("multioptpy.Optimizer.dic_rsirfo")

    msgs = []
    with contextlib.redirect_stdout(io.StringIO()):
        ic = dic_mod.InternalCoordinates(log_func=lambda m, **k: msgs.append(m))
        k = ic.build_active_subspace(geom.ravel())
    # bends and torsions are unimplemented stubs upstream
    assert any("_build_primitive_B_bends is not implemented" in m
               for m in msgs)
    assert any("_build_primitive_B_torsions is not implemented" in m
               for m in msgs)
    assert ic._build_primitive_B_bends(geom.ravel()).shape == (0, 9)
    assert ic._build_primitive_B_torsions(geom.ravel()).shape == (0, 9)

    # all-pairs stretches == our b_matrix with explicit pair bonds,
    # same enumeration order and sign convention
    assert ic.B_prim.shape == (3, 9)
    assert k == 3  # = 3N - 6 for water
    ours = OurIC(bonds=[(0, 1), (0, 2), (1, 2)], n_atoms=3)
    b_ours = np.asarray(ours.b_matrix(jnp.asarray(geom)))
    assert np.abs(ic.B_prim - b_ours).max() < 1e-13


def test_dic_transform_consistency_live():
    geom, g, h = _water_fixture()
    ic, k = _build_ic(geom)

    rng = np.random.default_rng(29)
    ds = rng.normal(size=k)
    dx = ic.back_transform_dic_to_cart(ds)
    # forward differential consistency: (U^T B) dx recovers ds exactly
    b_s = ic.U.T @ ic.B_prim
    assert np.abs(b_s @ dx - ds).max() < 1e-12
    # duality: g_q . ds == g_x . dx (gradient transform is the dual map)
    g_q = ic.project_cart_to_dic(g)
    assert float(g_q @ ds) == pytest.approx(float(g @ dx), rel=1e-12)
    # gradient transform == G_s^-1 B_s g with G_s = Lambda (diagonal)
    lam = np.diag(1.0 / np.diag(ic.Lambda_inv))
    assert np.abs(np.linalg.solve(lam, b_s @ g) - g_q).max() < 1e-12


def test_dic_newton_step_basis_invariance_live():
    from multioptpy_tpu.coords.internals import InternalCoordinates as OurIC

    geom, g, h = _water_fixture()
    ic, k = _build_ic(geom)

    t_mat = ic.Lambda_inv @ ic.U.T @ ic.B_prim
    t_dag = ic.B_prim.T @ ic.U @ ic.Lambda_inv
    h_q = t_mat @ h @ t_dag
    h_q = 0.5 * (h_q + h_q.T)
    dx_ref = t_dag @ np.linalg.solve(h_q, t_mat @ g)

    ours = OurIC(bonds=[(0, 1), (0, 2), (1, 2)], n_atoms=3)
    b = np.asarray(ours.b_matrix(jnp.asarray(geom)))
    dx_inv = b.T @ np.linalg.pinv(b @ h @ b.T, rcond=1e-10) @ (b @ g)
    assert np.abs(dx_ref - dx_inv).max() < 1e-12


def test_dic_rsirfo_run_step_replicated_live():
    dic_mod = _ref_module("multioptpy.Optimizer.dic_rsirfo")

    geom, g, h = _water_fixture()
    with contextlib.redirect_stdout(io.StringIO()):
        eng = dic_mod.DIC_RSIRFO(saddle_order=0, display_flag=False,
                                 method="fsb")
        eng.set_hessian(h.copy())
        mv = np.asarray(eng.run(geom.ravel(), g.copy(), B_e=-1.0,
                                g=g.copy())).ravel()
    assert eng.trust_radius == pytest.approx(0.5)

    # stretch-only DIC step carries no net translation or rotation
    m3 = mv.reshape(3, 3)
    assert np.abs(m3.sum(axis=0)).max() < 1e-14
    for ax in range(3):
        e = np.zeros(3)
        e[ax] = 1.0
        rot = np.cross(np.broadcast_to(e, (3, 3)), geom)
        assert abs(float(np.sum(rot * m3))) < 1e-14

    # replicate the full pipeline with the engine's own coordinate system
    ic = eng.coord_system
    t_mat = ic.Lambda_inv @ ic.U.T @ ic.B_prim
    g_q = t_mat @ g
    h_q = eng.dic_hessian
    wq, vq = np.linalg.eigh(0.5 * (h_q + h_q.T))
    live = np.abs(wq) > eng.small_eigval_thresh
    wf, vf = wq[live], vq[:, live]
    with contextlib.redirect_stdout(io.StringIO()):
        step_t = eng.get_rs_step(wf, vf.T @ g_q)
    dx = ic.B_prim.T @ ic.U @ ic.Lambda_inv @ (vf @ step_t)
    assert np.abs(mv + dx).max() < 1e-13

    # QUIRK: a second run() at a displaced geometry reuses the FROZEN
    # coordinate system (B_prim built once at the first geometry)
    b0 = ic.B_prim.copy()
    geom2 = geom + 0.05
    geom2[1, 1] += 0.3
    with contextlib.redirect_stdout(io.StringIO()):
        eng.run(geom2.ravel(), g.copy(), pre_geom=geom.ravel(),
                pre_g=g.copy(), B_e=-1.01, pre_B_e=-1.0, g=g.copy())
    assert eng.coord_system.B_prim is ic.B_prim
    assert np.array_equal(eng.coord_system.B_prim, b0)


def test_dic_solve_rfo_alpha_noop_live():
    """Same double-division defect as RSIRFO (wave 27): alpha never
    shrinks the step."""
    dic_mod = _ref_module("multioptpy.Optimizer.dic_rsirfo")

    geom, g, h = _water_fixture()
    ic, k = _build_ic(geom)
    t_mat = ic.Lambda_inv @ ic.U.T @ ic.B_prim
    t_dag = ic.B_prim.T @ ic.U @ ic.Lambda_inv
    h_q = 0.5 * ((t_mat @ h @ t_dag) + (t_mat @ h @ t_dag).T)
    wq, vq = np.linalg.eigh(h_q)
    gt = vq.T @ (t_mat @ g)

    with contextlib.redirect_stdout(io.StringIO()):
        eng = dic_mod.DIC_RSIRFO(saddle_order=0, display_flag=False)
    norms = []
    for alpha in (1.0, 100.0, 1e4):
        with contextlib.redirect_stdout(io.StringIO()):
            step, ev, _, _ = eng.solve_rfo(wq.copy(), gt.copy(), alpha)
        norms.append(np.linalg.norm(step))
    assert np.ptp(norms) < 1e-6 * norms[0]


def test_dic_update_hessian_secant_misscaling_live():
    """The "P2 Fix" projects the secant displacement with the GRADIENT
    transform (extra Lambda^-1); the true displacement differential is
    U^T B dx — they differ whenever G's eigenvalues are non-uniform."""
    geom, g, h = _water_fixture()
    ic, k = _build_ic(geom)

    lam_diag = 1.0 / np.diag(ic.Lambda_inv)
    assert np.ptp(lam_diag) > 1e-3  # non-uniform metric on this fixture

    rng = np.random.default_rng(291)
    dx = rng.normal(scale=0.05, size=9)
    used = ic.project_cart_to_dic(dx)          # what update_hessian feeds
    correct = ic.U.T @ (ic.B_prim @ dx)        # the true differential
    # executed relation: used = Lambda^-1 correct  (mis-scaled secant)
    assert np.abs(used - ic.Lambda_inv @ correct).max() < 1e-14
    assert np.abs(used - correct).max() > 1e-3 * np.abs(correct).max()
