"""LIVE parity vs the reference, wave 3: geometry utilities, interpolation,
SHAKE, path bending.

Like tests/test_reference_live.py / _live2.py, these execute the REAL
reference code (numpy/scipy modules importable in this image) side by side
with ours on identical inputs:

  * mass-weighted + Cartesian TR/rot Hessian projection
    (ref: Utils/calc_tools.py:170 project_out_hess_tr_and_rot, :249
    .._for_coord) vs our geometry.project_hessian_tr_rot — machine
    precision, isotope-mass tables included.
  * Kabsch alignment (ref: calc_tools.py:412 kabsch_algorithm) vs our
    geometry.align_to — same aligned coordinates.
  * natural-cubic-spline coefficients + evaluation
    (ref: Interpolation/interpolation.py:4 compute_natural_spline_
    coefficients, :46 evaluate_spline) vs our interpolation.
    cubic_spline_resample on the same arc-length parametrization.
  * Bernstein path interpolation (ref: Interpolation/
    binomial_interpolation.py:7) vs our bernstein_resample.
  * SHAKE bond restoration (ref: Constraint/constraint_condition.py:62)
    vs our Gauss-Newton Constraints.shake — both land on the constraint
    manifold; for an equal-mass diatomic the restored geometries coincide.
  * IRC path bending angle (ref: Utils/calc_tools.py:485
    calc_multi_dim_vec_angle as used at IRC/euler.py:367-373) vs our
    analysis.pes.path_bending_angles. Documented reference quirk: it adds
    +1e-8 INSIDE arccos (a no-clip guard), so agreement is pinned at 1e-5
    degrees rather than machine precision.
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


def _water():
    # Bohr, slightly distorted so nothing is symmetric
    coords = np.array([[0.00, 0.10, 0.22],
                       [0.05, 1.43, -0.89],
                       [-0.11, -1.47, -0.86]], dtype=np.float64)
    return coords, ["O", "H", "H"], np.array([8, 1, 1])


# ==========================================================================
# TR/rot projection of Hessians (calc_tools.py:170, :249)
# ==========================================================================

def _random_sym(n, seed):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, n))
    return 0.5 * (m + m.T)


def test_mw_tr_rot_projection_live():
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    from multioptpy_tpu.geometry import masses_from_z, project_hessian_tr_rot

    coords, syms, z = _water()
    h = _random_sym(9, seed=11)

    with contextlib.redirect_stdout(io.StringIO()):
        ref = ct.project_out_hess_tr_and_rot(h.copy(), syms, coords.copy(),
                                             display_eigval=False)

    masses = np.asarray(masses_from_z(jnp.asarray(z)))
    sm = np.repeat(np.sqrt(masses), 3)
    h_mw = h / sm[:, None] / sm[None, :]
    ours = np.asarray(project_hessian_tr_rot(
        jnp.asarray(h_mw), jnp.asarray(coords), jnp.asarray(masses)))
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_cartesian_tr_rot_projection_live():
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    from multioptpy_tpu.geometry import project_hessian_tr_rot

    coords, syms, _ = _water()
    h = _random_sym(9, seed=12)

    with contextlib.redirect_stdout(io.StringIO()):
        ref = ct.project_out_hess_tr_and_rot_for_coord(
            h.copy(), syms, coords.copy(), display_eigval=False)

    ours = np.asarray(project_hessian_tr_rot(jnp.asarray(h),
                                             jnp.asarray(coords)))
    np.testing.assert_allclose(ours, ref, atol=1e-12)


# ==========================================================================
# Kabsch alignment (calc_tools.py:412)
# ==========================================================================

def test_kabsch_alignment_live():
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    from multioptpy_tpu.geometry import align_to, rmsd

    rng = np.random.default_rng(5)
    q = rng.standard_normal((6, 3)) * 2.0
    # rotate + translate + noise
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0.0],
                    [np.sin(theta), np.cos(theta), 0.0],
                    [0.0, 0.0, 1.0]])
    p = q @ rot.T + np.array([1.0, -2.0, 0.5]) \
        + 0.02 * rng.standard_normal((6, 3))

    # ref mutates its inputs and returns (P aligned+centered, Q centered)
    ref_p, ref_q = ct.kabsch_algorithm(p.copy(), q.copy())

    ours_aligned = np.asarray(align_to(jnp.asarray(p), jnp.asarray(q)))
    ours_centered = ours_aligned - q.mean(axis=0)
    np.testing.assert_allclose(ours_centered, ref_p, atol=1e-10)
    np.testing.assert_allclose(q - q.mean(axis=0), ref_q, atol=1e-12)
    # and the post-alignment RMSDs coincide
    ref_rmsd = np.sqrt(np.mean(np.sum((ref_p - ref_q) ** 2, axis=1)))
    ours_rmsd = float(rmsd(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(ours_rmsd, ref_rmsd, rtol=1e-10)


# ==========================================================================
# Natural cubic spline (Interpolation/interpolation.py:4,:46)
# ==========================================================================

def test_natural_spline_live():
    itp = _ref_module("multioptpy.Interpolation.interpolation")
    from multioptpy_tpu.interpolation import _arc_lengths, \
        cubic_spline_resample

    rng = np.random.default_rng(9)
    path = np.cumsum(rng.standard_normal((6, 3, 3)) * 0.4, axis=0)
    path = jnp.asarray(path)
    n_out = 17
    ours = np.asarray(cubic_spline_resample(path, n_out))

    s = np.asarray(_arc_lengths(path))
    t = np.linspace(0.0, 1.0, n_out)
    flat = np.asarray(path).reshape(6, -1)
    ref = np.empty((n_out, flat.shape[1]))
    for dim in range(flat.shape[1]):
        a, b, c_full, d, _ = itp.compute_natural_spline_coefficients(
            s, flat[:, dim])
        ref[:, dim] = [itp.evaluate_spline(s, a, b, c_full, d, ti)
                       for ti in t]
    np.testing.assert_allclose(ours.reshape(n_out, -1), ref, atol=1e-10)


# ==========================================================================
# Bernstein path interpolation (binomial_interpolation.py:7)
# ==========================================================================

def test_bernstein_interpolation_live():
    bi = _ref_module("multioptpy.Interpolation.binomial_interpolation")
    from multioptpy_tpu.interpolation import bernstein_resample

    rng = np.random.default_rng(2)
    path = np.cumsum(rng.standard_normal((5, 4, 3)) * 0.3, axis=0)
    n_out = 12
    with contextlib.redirect_stdout(io.StringIO()):
        ref = bi.bernstein_interpolation(list(path), n_points=n_out)
    ours = np.asarray(bernstein_resample(jnp.asarray(path), n_out))
    # ours evaluates the Bernstein basis in log space with a 1e-12 guard;
    # interior agreement is ~1e-9, endpoints exact by construction
    np.testing.assert_allclose(ours, ref, atol=5e-9)


# ==========================================================================
# SHAKE bond restoration (constraint_condition.py:62)
# ==========================================================================

def test_shake_bond_live():
    cc = _ref_module("multioptpy.Constraint.constraint_condition")
    from multioptpy_tpu.constraints.project import Constraints
    from multioptpy_tpu.units import ANGSTROM2BOHR

    target_ang = 0.80
    target_bohr = target_ang * ANGSTROM2BOHR
    # equal-mass diatomic (H2) stretched off the manifold
    prev = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, target_bohr]])
    geom = np.array([[0.0, 0.0, -0.21], [0.0, 0.0, target_bohr + 0.34]])
    mom = np.zeros((2, 3))

    shake = cc.SHAKE(time_scale=0.5,
                     constraints=[[[target_ang, 1, 2]], [], []])
    with contextlib.redirect_stdout(io.StringIO()):
        ref_geom, _ = shake.run(geom.copy(), prev.copy(), mom.copy(),
                                ["H", "H"])
    ref_r = np.linalg.norm(ref_geom[0] - ref_geom[1])
    assert abs(ref_r - target_bohr) < 2e-5

    cons = Constraints(bonds=[(1, 2, target_ang)], n_atoms=2)
    tgt = cons.targets(jnp.asarray(prev))
    ours_geom = np.asarray(cons.shake(jnp.asarray(geom), tgt))
    ours_r = np.linalg.norm(ours_geom[0] - ours_geom[1])
    assert abs(ours_r - target_bohr) < 1e-8

    # equal masses + collinear displacement: both methods distribute the
    # correction symmetrically along the bond -> same restored geometry
    # (to the reference's 1e-5 convergence criterion)
    np.testing.assert_allclose(ours_geom, ref_geom, atol=3e-5)


# ==========================================================================
# IRC path bending angle (calc_tools.py:485 via IRC/euler.py:367-373)
# ==========================================================================

def test_path_bending_angle_live():
    ct = _ref_module("multioptpy.Utils.calc_tools").Calculationtools()
    from multioptpy_tpu.analysis.pes import path_bending_angles

    rng = np.random.default_rng(4)
    mw_path = np.cumsum(rng.standard_normal((5, 3, 3)) * 0.2, axis=0)

    ours = path_bending_angles(mw_path)
    p = mw_path.reshape(5, -1)
    for k, i in enumerate(range(1, 4)):
        # the reference computes angle(prev - cur, next - cur), exactly our
        # convention (euler.py:368-371)
        ref = np.degrees(ct.calc_multi_dim_vec_angle(
            p[i - 1] - p[i], p[i + 1] - p[i]))
        # ref adds +1e-8 inside arccos instead of clipping -> 1e-5 deg
        np.testing.assert_allclose(ours[k], ref, atol=1e-4)
