"""LIVE parity wave 32: twoPSHS — the reference's two-point scaled
hypersphere search executed (shared SHS transforms + the 2PSHS-specific
product-pull hypersphere gradient) side by side with our
drivers/twopshs.py conventions.

Conventions learned by execution (ref: OtherMethod/twopshs.py):

  * The SQ transform machinery is byte-identical in behavior to ADDF's
    (wave 31): frames from eigenvector ROWS (SQ = V.T diag(sqrt lam)),
    inverted sqrt(lam) scaling — both re-pinned here on the shared
    class to record that the defect is inherited by 2PSHS.
  * calc_cartesian_distance (:189) is sqrt(sum((a-b)^2)/n_atoms) —
    an RMSD with NO Kabsch alignment and NO permutation handling
    (rotating one copy changes the "distance"; pinned executed). Our
    mapper StructureChecker aligns first.
  * grad_hypersphere (:200-267), the 2PSHS core: displace eqpoint by
    the sphere vector, evaluate grad there, project out the radial
    direction EnADD, then ADD a product-pull term: the unit direction
    to sp1_structure, tangent-projected, renormalized, weighted by
    min(1, RMSD_to_sp1 / 0.12) TIMES THE NORM OF THE TANGENTIAL
    GRADIENT — i.e. far from the product the pull has exactly the same
    magnitude as the physical tangential force (a 45-degree blend),
    pinned executed against a numpy replica. grad() returning False
    propagates as (False, False).
  * QUIRK (latent): the sphere vector is copied into the full space
    POSITIONALLY (nADD_full[i] = nADD_reduced[i], :212-214, commented
    "this is approximate") — an identity copy only because the
    eigenvectors passed in practice have full 3N length.
  * Ours (drivers/twopshs.py) grows product-SEEDED isoenergy spheres
    with a pure projected FIRE on the sphere — no gradient-norm-scaled
    pull blending — and uses the paper's sqrt scaling (wave 31).

Ref anchors: OtherMethod/twopshs.py:13-48 (init, converge_criteria
0.12), :59-158 (shared transforms), :189-267; ours: drivers/twopshs.py.
"""

import os
import sys
import types

import numpy as np
import pytest

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


class _Cfg:
    addf_step_num = 5
    nadd = 2
    addf_step_size = 0.1


def _method():
    mod = _ref_module("multioptpy.OtherMethod.twopshs")
    return mod.twoPSHSlikeMethod(_Cfg())


def test_twopshs_shares_addf_transform_defects_live():
    m = _method()
    rng = np.random.default_rng(32)
    h = rng.normal(size=(4, 4))
    h = h @ h.T + np.eye(4)
    lam, v = np.linalg.eigh(h)

    sq = m.SQaxes(lam, v, 4)
    # same transposed frame + inverted scaling as ADDF (wave 31)
    assert np.abs(sq - v.T @ np.diag(np.sqrt(lam))).max() < 1e-14
    assert np.abs(m.SQaxes_inv(lam, v, 4) @ sq - np.eye(4)).max() < 1e-12


def test_twopshs_cartesian_distance_no_alignment_live():
    m = _method()
    rng = np.random.default_rng(320)
    a = rng.normal(size=(5, 3))

    d_same = m.calc_cartesian_distance(a, a.copy())
    assert d_same == pytest.approx(0.0, abs=1e-15)
    b = a + np.array([0.3, -0.1, 0.2])
    expect = np.sqrt(np.sum((a - b) ** 2) / 5)
    assert m.calc_cartesian_distance(a, b) == pytest.approx(expect,
                                                            rel=1e-12)
    # NO alignment: a rigid rotation of the same structure reads as far
    th = 0.8
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1.0]])
    assert m.calc_cartesian_distance(a, a @ rot.T) > 0.3
    with pytest.raises(ValueError):
        m.calc_cartesian_distance(a, a[:4])


def test_twopshs_grad_hypersphere_product_pull_live():
    m = _method()
    rng = np.random.default_rng(321)
    n_atoms = 3
    dim = 9
    h = rng.normal(size=(dim, dim))
    h = h @ h.T + np.eye(dim)
    lam, v = np.linalg.eigh(h)
    m.SQ = m.SQaxes(lam, v, dim)
    m.SQ_inv = m.SQaxes_inv(lam, v, dim)
    m.dim = dim
    m.config.use_pbc = False  # periodicpoint consults config in some paths

    eqpoint = rng.normal(size=(n_atoms, 3))
    sp1 = eqpoint + rng.normal(scale=2.0, size=(n_atoms, 3))
    m.sp1_structure = sp1

    x_min = rng.normal(size=(n_atoms, 3))

    def grad_fn(x):
        return 1.7 * (np.asarray(x) - x_min)

    a_sphere = 0.02
    theta = m.calctheta(v[:, 0], v, lam)
    target, g_out = m.grad_hypersphere(None, grad_fn, eqpoint, a_sphere,
                                       theta)

    # replica of :200-263
    n_add = m.SuperSphere_cartesian(a_sphere, theta, m.SQ, dim)
    e_hat = n_add / np.linalg.norm(n_add)
    tgt = eqpoint + n_add.reshape(n_atoms, 3)
    assert np.allclose(target, tgt, atol=1e-13)
    g = grad_fn(tgt).flatten()
    g_t = g - (g @ e_hat) * e_hat
    dist = np.sqrt(np.sum((tgt - sp1) ** 2) / n_atoms)
    pull = (sp1 - tgt).flatten()
    pull /= np.linalg.norm(pull)
    pull_t = pull - (pull @ e_hat) * e_hat
    pull_t /= np.linalg.norm(pull_t)
    weight = min(1.0, dist / m.converge_criteria)
    expect = g_t + pull_t * weight * np.linalg.norm(g_t)
    assert np.allclose(np.asarray(g_out).flatten(), expect, atol=1e-12)

    # far from the product (weight saturates at 1) the pull term's
    # magnitude EQUALS the tangential force norm — a fixed 45-degree
    # blend toward the product, executed
    assert dist > m.converge_criteria
    pull_part = np.asarray(g_out).flatten() - g_t
    assert np.linalg.norm(pull_part) == pytest.approx(
        np.linalg.norm(g_t), rel=1e-12)

    # gradient failure propagates as (False, False)
    t2, g2 = m.grad_hypersphere(None, lambda x: False, eqpoint, a_sphere,
                                theta)
    assert t2 is False and g2 is False
