"""LIVE parity wave 47: the remaining MEP force laws — QSM v1 and
Direct MaxFlux (DMF) — plus IRC/converge_criteria, executed side by side
with our drivers/neb.py qsm/dmf variants and drivers' convergence
checks.

Conventions learned by execution (ref: MEP/pathopt_qsm_force.py,
pathopt_dmf_force.py, IRC/converge_criteria.py):

  * convergence_check (converge_criteria.py:4-26) tests
    abs(grad.max()) — the ABSOLUTE VALUE OF THE SIGNED MAX: a gradient
    whose components are all negative (e.g. largest -0.5, signed max
    -1e-6) passes the max-force test and can be declared converged at
    |g| = 0.5 (pinned) — the same signed-max family as TR_NEB's
    check_convergence (wave 40). Our drivers use max|g|.
  * QSM v1 (pathopt_qsm_force.py): its extremum_list_index APPENDS 0
    TWICE to both extremum lists (:14-17) — image 0 is unconditionally
    a "local max" and "local min" (the DMF copy of the same helper
    explicitly strips endpoints instead, pathopt_dmf_force.py:20-24).
    Its CI-NEB gate `(i != 1 or i != nnode-2)` (:50) is a TAUTOLOGY
    (same and/or slip as BNEB's, wave 20), so with -ci active the
    climbing branch fires even at node 1 — and then CRASHES with
    AttributeError: CaluculationQSM defines NO calc_ci_neb_force
    (:51 calls it; only the BNEB/EWBNEB classes have it). QSM + CI-NEB
    has never worked upstream (pinned by execution). The monotonic-
    segment branches (:69-80) build a per-atom-distance B matrix from
    the UPHILL neighbor pair and subtract the full internal-gradient
    image; interior forces finally pass projection() (:128-150), which
    removes the components along BOTH adjacent segment directions
    (Gram-Schmidt pair), mirrored exactly below.
  * DMF (pathopt_dmf_force.py:316-447) returns the gradient of
    log(action)/beta pushed through the B-spline basis, zeroes endpoint
    forces, clips magnitudes to <= 1e2 — and INJECTS SEEDED RANDOM
    NOISE into any interior image whose force norm is below 1e-8
    (np.random.seed(i+42), sigma = 1e-6 * mean|geometry|, :415-425):
    a fully degenerate band (identical images, zero gradients) returns
    exactly reproducible Gaussian noise instead of zeros, "to prevent
    division by zero in trust_radius_neb.py" (pinned against a
    mirrored np.random sequence, plus call-to-call determinism). Our
    dmf variant returns true zero forces on a stationary band.
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
# IRC convergence criteria
# ==========================================================================

def test_converge_criteria_live_signed_max():
    mod = _ref_module("multioptpy.IRC.converge_criteria")
    g = np.array([[-0.5, -0.3, -1e-6], [-0.2, -0.4, -0.1]])
    # |g|max = 0.5 but signed max = -1e-6 -> abs = 1e-6: "converged"
    # whenever rms also passes... rms here is large, so flip rms off by
    # scaling thresholds
    assert mod.convergence_check(g, 1e-3, 10.0) is True
    # the mirrored positive gradient is NOT converged
    assert mod.convergence_check(-g, 1e-3, 10.0) is False


# ==========================================================================
# QSM v1
# ==========================================================================

def test_qsm_live_extremum_index_zero_padding():
    mod = _ref_module("multioptpy.MEP.pathopt_qsm_force")
    e = np.array([0.0, 1.0, 5.0, 1.0, 0.0])
    lmax, lmin = mod.extremum_list_index(e)
    assert lmax.count(0) == 2                  # 0 appended twice
    assert lmin.count(0) == 2
    assert 2 in lmax                           # the real maximum

    # the DMF copy of the helper strips endpoints instead
    dmf = _ref_module("multioptpy.MEP.pathopt_dmf_force")
    lmax2, lmin2 = dmf.extremum_list_index(e)
    assert 0 not in lmax2 and 0 not in lmin2
    assert lmax2 == [2]


def test_qsm_live_ci_neb_branch_crashes_attributeerror():
    mod = _ref_module("multioptpy.MEP.pathopt_qsm_force")
    eng = mod.CaluculationQSM(APPLY_CI_NEB=0)
    rng = np.random.default_rng(80)
    n_img, n_atom = 5, 2
    band = np.array([np.linspace(0, 1, n_img)[i] * np.ones((n_atom, 3))
                     + 0.1 * rng.standard_normal((n_atom, 3))
                     for i in range(n_img)])
    grads = 0.1 * rng.standard_normal((n_img, n_atom, 3))
    e = np.array([0.0, 5.0, 1.0, 0.5, 0.0])   # local max at node 1
    with pytest.raises(AttributeError):
        _quiet(eng.calc_force, band, e, list(grads), 1, ["H", "H"])


def test_qsm_live_monotonic_branch_mirror():
    mod = _ref_module("multioptpy.MEP.pathopt_qsm_force")
    rc = _ref_module("multioptpy.Coordinate.redundant_coordinate")
    eng = mod.CaluculationQSM()                # CI off (99999)
    rng = np.random.default_rng(81)
    n_img, n_atom = 4, 2
    band = np.array([i * np.array([[1.0, 0.2, 0.0], [0.0, 1.0, 0.3]])
                     + 0.05 * rng.standard_normal((n_atom, 3))
                     for i in range(n_img)])
    grads = 0.1 * rng.standard_normal((n_img, n_atom, 3))
    e = np.array([0.0, 1.0, 2.0, 3.0])        # strictly uphill
    got = _quiet(eng.calc_force, band, e, list(grads), 0, ["H", "H"])

    # endpoints: plain -gradient
    np.testing.assert_allclose(got[0], -grads[0], atol=0)
    np.testing.assert_allclose(got[-1], -grads[-1], atol=0)

    # interior mirror: uphill branch uses the FORWARD pair (i, i+1)
    forces = [-grads[0]]
    for i in (1, 2):
        g_col = grads[i].reshape(-1, 1)
        b = eng.calc_B_matrix_for_NEB_tangent(band[i], band[i + 1])
        int_g = rc.calc_int_grad_from_pBmat(g_col, b)
        proj_g = rc.calc_cart_grad_from_pBmat(-1 * int_g, b)
        forces.append(-(g_col + proj_g).reshape(-1, 3))
    forces.append(-grads[-1])
    want = mod.projection(np.array(forces), band)
    np.testing.assert_allclose(got, want, atol=1e-13)

    # projection(): interior forces orthogonal to both unit segments
    for i in (1, 2):
        v1 = (band[i] - band[i - 1]).ravel()
        v2 = (band[i + 1] - band[i]).ravel()
        assert abs(got[i].ravel() @ (v1 / np.linalg.norm(v1))) < 1e-10
        assert abs(got[i].ravel() @ (v2 / np.linalg.norm(v2))) < 1e-10


# ==========================================================================
# DMF
# ==========================================================================

def test_dmf_live_degenerate_band_returns_seeded_noise():
    mod = _ref_module("multioptpy.MEP.pathopt_dmf_force")
    eng = mod.CaluculationDMF()
    n_img, n_atom = 6, 2
    img = np.array([[0.5, -1.0, 0.25], [1.5, 0.75, -0.5]])
    band = np.array([img.copy() for _ in range(n_img)])
    grads = np.zeros((n_img, n_atom, 3))
    e = np.zeros(n_img)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got = eng.calc_force(band, e, list(grads), 0, ["H", "H"])
    assert "adding small noise" in buf.getvalue()

    # endpoints zero, interior = the exact np.random sequence
    np.testing.assert_allclose(got[0], 0.0, atol=0)
    np.testing.assert_allclose(got[-1], 0.0, atol=0)
    scale = np.mean(np.abs(img))
    for i in range(1, n_img - 1):
        np.random.seed(i + 42)
        noise = np.random.normal(0, 1e-6 * scale, (n_atom, 3))
        np.testing.assert_allclose(got[i], noise, atol=1e-18)
        assert np.linalg.norm(got[i]) > 0.0

    # deterministic: a second identical call returns identical "forces"
    eng2 = mod.CaluculationDMF()
    got2 = _quiet(eng2.calc_force, band, e, list(grads), 0, ["H", "H"])
    np.testing.assert_allclose(got2, got, atol=0)


def test_dmf_live_endpoints_zero_on_real_band_vs_ours():
    mod = _ref_module("multioptpy.MEP.pathopt_dmf_force")
    eng = mod.CaluculationDMF()
    rng = np.random.default_rng(82)
    n_img, n_atom = 6, 2
    band = np.array([i * 0.3 * np.ones((n_atom, 3))
                     + 0.05 * rng.standard_normal((n_atom, 3))
                     for i in range(n_img)])
    grads = 0.05 * rng.standard_normal((n_img, n_atom, 3))
    e = np.array([0.0, 0.5, 1.2, 1.0, 0.4, 0.1])
    got = _quiet(eng.calc_force, band, e, list(grads), 0, ["H", "H"])
    np.testing.assert_allclose(got[0], 0.0, atol=0)   # fixed endpoints
    np.testing.assert_allclose(got[-1], 0.0, atol=0)
    assert np.all(np.isfinite(got))
    # magnitudes clipped to <= 1e2 per image
    for i in range(n_img):
        assert np.linalg.norm(got[i].ravel()) <= 1e2 + 1e-9

    # ours: the dmf variant on a stationary (degenerate) band returns
    # true zeros, no noise injection
    from multioptpy_tpu.drivers.neb import neb_forces
    import jax.numpy as jnp
    img = jnp.asarray(band[0])
    flat_band = jnp.stack([img] * n_img)
    zero_g = jnp.zeros((n_img, n_atom, 3))
    ours = neb_forces(flat_band, jnp.zeros(n_img), zero_g, 0.01,
                      "dmf", False, False, 10.0, 4)
    np.testing.assert_allclose(np.asarray(ours), 0.0, atol=1e-12)
