"""LIVE parity wave 28: the 2-state model-function family — the
reference's own SeamModelFunction / AvoidingModelFunction /
ConicalModelFunction / OptMECI / BITSSModelFunction classes executed side
by side with our TwoStateModelFunction / BITSSCalculator.

Conventions learned by execution (ref: ModelFunction/*.py):

  * Seam (seam_model_function.py, alpha=0.05): E = mean + dE^2/alpha;
    the upstream gradient and Hessian ARE the exact derivatives of the
    stated energy (pinned vs finite differences of its own calc_energy),
    and both match our autodiffed TwoStateModelFunction(kind="seam")
    to machine precision once alpha is matched.
  * Avoiding (avoiding_model_function.py, alpha=0.01): the energy is
    E = mean + 0.5 sqrt(dE^2 + 4U), U = alpha/2 exp(-dE^2/alpha) —
    pinned exactly. UPSTREAM DEFECT, pinned by execution: calc_grad is
    NOT the derivative of calc_energy. Executed symbolically it equals
    0.5(g1+g2) + (1/a)(dE*dg + 4U*dU), while the true derivative is
    0.5(g1+g2) + (1/(2a))(dE*dg + 2*dU): the dE term carries 2x and the
    dU term 4U/0.5 = 8U x the correct weight. Its calc_hess body is
    `return` (None). Ours uses a CONSTANT diabatic coupling
    (sqrt(dE^2 + 4c^2) of a 2x2 diabatic model) with exact autodiff —
    a deliberate redesign, not bug-compatible.
  * Conical (conical_model_function.py, alpha=0.025, sigma=3.5): the
    penalty sigma dE^2/(dE + alpha) uses the SIGNED gap — executed at
    dE = -alpha the denominator vanishes (pole; |E| -> 1e6 scale) and
    for dE < -alpha the "penalty" is NEGATIVE (rewards a large gap).
    Ours uses |dE| (bounded, symmetric, the published Levine-Martinez
    form which assumes state ordering E1 >= E2). For dE > 0 the two
    energies agree exactly and the upstream gradient is the true
    derivative (pinned vs FD); its calc_hess is also None.
  * OptMECI (opt_meci.py): branching-plane-updating gradient projection.
    Pinned by execution: y_0 = Gram-Schmidt of the mean gradient
    against x_0 = normalized difference gradient; the Eq-4 update
    y_k = ((y_{k-1}.x_k) x_{k-1} - (x_{k-1}.x_k) y_{k-1}) / |.|;
    gp_grad = 2 dE x_hat + (I - xx^T - yy^T) g_mean. NOTE the gap force
    omits |g1 - g2| (it is 2 dE x_hat, NOT the gradient of dE^2 which
    would be 2 dE |dg| x_hat) — the composed force is not the gradient
    of any scalar, exactly like the reference's MESX2. Ours offers the
    penalty-form meci kind instead (converges to the same MECI);
    our mesx2 composed force shares the single-projection structure
    and is pinned against the reference's gap+seam composition on a
    shared fixture (one projector instead of MECI's two).
  * BITSS (binary_image_ts_search_model_function.py): kappa updates at
    iter % 500 == 0 — kappa_e = alpha/(2 E_B), kappa_d =
    max(sqrt(pg1^2+pg2^2)/(2^1.5 beta d), E_B/(beta d^2)) — match our
    update_kappas exactly (same alpha=10/beta=0.02 defaults) when our
    E_B floor doesn't engage. QUIRK pinned: the target distance d is
    multiplied by (1-f) = 0.5 on EVERY calc_energy call (not per
    update cycle): two consecutive calls at the same geometry shrink d
    4x. Ours contracts once per optimization stage (contract()).

Ref anchors: ModelFunction/seam_model_function.py:4-28,
avoiding_model_function.py:3-28, conical_model_function.py:4-25,
opt_meci.py:3-116, binary_image_ts_search_model_function.py:6-139;
ours: calculators/two_state.py.
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


from multioptpy_tpu.calculators.base import Calculator


class _Quad(Calculator):
    """Analytic quadratic PES 0.5 k |x - x0|^2 + e0 (pure JAX)."""

    on_device = True

    def __init__(self, x0, k=1.0, e0=0.0, **kw):
        super().__init__(**kw)
        self.x0 = jnp.asarray(x0, dtype=jnp.float64)
        self.k = k
        self.e0 = e0

    def energy(self, coords, z):
        d = coords - self.x0
        return 0.5 * self.k * jnp.sum(d * d) + self.e0


def _fixture():
    rng = np.random.default_rng(28)
    coords = rng.normal(size=(3, 3))
    z = jnp.array([1, 1, 1])
    c1 = _Quad(rng.normal(size=(3, 3)), k=1.3, e0=-0.02)
    c2 = _Quad(rng.normal(size=(3, 3)), k=0.7, e0=0.05)
    return coords, z, c1, c2


def _states(coords, z, c1, c2):
    e1, g1 = c1.energy_and_gradient(jnp.asarray(coords), z)
    e2, g2 = c2.energy_and_gradient(jnp.asarray(coords), z)
    h1 = np.asarray(c1.hessian(jnp.asarray(coords), z))
    h2 = np.asarray(c2.hessian(jnp.asarray(coords), z))
    return (float(e1), float(e2), np.asarray(g1), np.asarray(g2), h1, h2)


def _fd_along(e_of_two, e1, e2, g1, g2, direction, eps=1e-6):
    """Central FD of a model energy along a Cartesian direction, moving
    BOTH state energies consistently (E_i(t) = E_i + t g_i.u + O(t^2))."""
    du1 = float(np.sum(g1.reshape(-1) * direction))
    du2 = float(np.sum(g2.reshape(-1) * direction))
    ep = e_of_two(e1 + eps * du1, e2 + eps * du2)
    em = e_of_two(e1 - eps * du1, e2 - eps * du2)
    return (ep - em) / (2 * eps)


# ==========================================================================
# Seam: upstream formulas exact; full parity with ours
# ==========================================================================

def test_seam_energy_grad_hess_parity_live():
    smf_mod = _ref_module("multioptpy.ModelFunction.seam_model_function")
    from multioptpy_tpu.calculators.two_state import TwoStateModelFunction

    coords, z, c1, c2 = _fixture()
    e1, e2, g1, g2, h1, h2 = _states(coords, z, c1, c2)

    ref = smf_mod.SeamModelFunction()
    e_ref = ref.calc_energy(e1, e2)
    gr1, gr2 = ref.calc_grad(e1, e2, g1, g2)
    h_ref = ref.calc_hess(e1, e2, g1.reshape(-1), g2.reshape(-1), h1, h2)
    assert np.allclose(gr1, gr2)  # both returned gradients are identical

    ours = TwoStateModelFunction(c1, c2, kind="seam", alpha=ref.alpha)
    e_o, g_o = ours.energy_and_gradient(jnp.asarray(coords), z)
    assert float(e_o) == pytest.approx(e_ref, abs=1e-12)
    assert np.allclose(np.asarray(g_o), gr1, atol=1e-10)
    # reference grad == FD of its own energy (upstream calculus correct)
    u = np.random.default_rng(1).normal(size=9)
    u /= np.linalg.norm(u)
    fd = _fd_along(ref.calc_energy, e1, e2, g1, g2, u)
    assert float(np.sum(np.asarray(gr1).reshape(-1) * u)) == pytest.approx(
        fd, rel=1e-6)
    # and its analytic Hessian matches our autodiff
    h_o = np.asarray(ours.hessian(jnp.asarray(coords), z))
    assert np.allclose(h_ref, h_o, atol=1e-8)


# ==========================================================================
# Avoiding: upstream gradient is NOT the derivative of its own energy
# ==========================================================================

def test_avoiding_gradient_defect_live():
    amf_mod = _ref_module("multioptpy.ModelFunction.avoiding_model_function")

    coords, z, c1, c2 = _fixture()
    e1, e2, g1, g2, h1, h2 = _states(coords, z, c1, c2)

    ref = amf_mod.AvoidingModelFunction()
    # energy formula pinned exactly
    d = e1 - e2
    u_coupling = ref.alpha / 2.0 * np.exp(-d ** 2 / ref.alpha)
    expect_e = 0.5 * (e1 + e2) + 0.5 * np.sqrt(d ** 2 + 4 * u_coupling)
    assert ref.calc_energy(e1, e2) == pytest.approx(expect_e, abs=1e-14)

    gr1, _ = ref.calc_grad(e1, e2, g1, g2)
    u = np.random.default_rng(2).normal(size=9)
    u /= np.linalg.norm(u)
    fd = _fd_along(ref.calc_energy, e1, e2, g1, g2, u)
    claimed = float(np.sum(np.asarray(gr1).reshape(-1) * u))
    # DEFECT: executed mismatch is large (wrong 1/a vs 1/(2a) and 4U vs
    # 1/2 weights) — not a rounding artifact
    assert abs(claimed - fd) > 1e-3 * max(abs(fd), 1e-10)
    # the executed value matches the (wrong) formula as written:
    b = np.exp(-d ** 2 / ref.alpha)
    a = np.sqrt(d ** 2 + 4 * u_coupling)
    du = -d * b * (g1 - g2)
    wrong = 0.5 * (g1 + g2) + (1.0 / a) * (d * (g1 - g2) + 4 * u_coupling * du)
    assert np.allclose(np.asarray(gr1), wrong, atol=1e-12)
    # upstream hessian body is `return` -> None
    assert ref.calc_hess(e1, e2, g1, g2, h1, h2) is None

    # ours: constant-coupling diabatic model, gradient IS the derivative
    from multioptpy_tpu.calculators.two_state import TwoStateModelFunction
    ours = TwoStateModelFunction(c1, c2, kind="avoiding", coupling=1e-3)
    e_o, g_o = ours.energy_and_gradient(jnp.asarray(coords), z)
    eps = 1e-6
    step = eps * u.reshape(3, 3)
    ep = float(ours.energy(jnp.asarray(coords + step), z))
    em = float(ours.energy(jnp.asarray(coords - step), z))
    assert float(np.sum(np.asarray(g_o).reshape(-1) * u)) == pytest.approx(
        (ep - em) / (2 * eps), rel=1e-6)


# ==========================================================================
# Conical: signed-gap pole upstream; ours symmetric; dE>0 branch agrees
# ==========================================================================

def test_conical_signed_gap_pole_live():
    cmf_mod = _ref_module("multioptpy.ModelFunction.conical_model_function")
    from multioptpy_tpu.calculators.two_state import TwoStateModelFunction

    coords, z, c1, c2 = _fixture()
    e1, e2, g1, g2, h1, h2 = _states(coords, z, c1, c2)

    ref = cmf_mod.ConicalModelFunction()
    # dE > 0 branch: energies agree exactly (|dE| == dE), gradient is the
    # true derivative of the stated energy
    e_hi, e_lo = max(e1, e2), min(e1, e2)
    ours = TwoStateModelFunction(c1, c2, kind="conical", alpha=ref.alpha,
                                 sigma=ref.sigma)
    d_pos = e_hi - e_lo
    expect = 0.5 * (e_hi + e_lo) + ref.sigma * d_pos ** 2 / (d_pos + ref.alpha)
    assert ref.calc_energy(e_hi, e_lo) == pytest.approx(expect, abs=1e-14)
    u = np.random.default_rng(3).normal(size=9)
    u /= np.linalg.norm(u)
    fd = _fd_along(ref.calc_energy, e_hi, e_lo, g1, g2, u)
    gr1, _ = ref.calc_grad(e_hi, e_lo, g1, g2)
    assert float(np.sum(np.asarray(gr1).reshape(-1) * u)) == pytest.approx(
        fd, rel=1e-6)
    assert ref.calc_hess(e_hi, e_lo, g1, g2, h1, h2) is None

    # QUIRK: signed gap — at dE = -alpha the penalty denominator vanishes
    near_pole = ref.calc_energy(0.0, ref.alpha * (1 + 1e-9))
    assert abs(near_pole) > 1e6
    # and for dE < -alpha the "penalty" REWARDS opening the gap
    penalty_neg = ref.calc_energy(0.0, 0.5) - 0.25  # mean = 0.25
    assert penalty_neg < 0
    # ours is symmetric in the gap sign and bounded everywhere
    def our_pen(dd):
        return ref.sigma * dd ** 2 / (abs(dd) + ref.alpha)
    assert our_pen(0.5) == our_pen(-0.5)
    e_sym_pos = float(TwoStateModelFunction(
        _QuadConst(0.5), _QuadConst(0.0), kind="conical", alpha=ref.alpha,
        sigma=ref.sigma).energy(jnp.zeros((1, 3)), jnp.array([1])))
    e_sym_neg = float(TwoStateModelFunction(
        _QuadConst(0.0), _QuadConst(0.5), kind="conical", alpha=ref.alpha,
        sigma=ref.sigma).energy(jnp.zeros((1, 3)), jnp.array([1])))
    assert e_sym_pos == pytest.approx(e_sym_neg, abs=1e-14)


class _QuadConst(Calculator):
    on_device = True

    def __init__(self, e0, **kw):
        super().__init__(**kw)
        self.e0 = e0

    def energy(self, coords, z):
        return self.e0 + 0.0 * jnp.sum(coords * coords)


# ==========================================================================
# OptMECI: branching-plane update + composed GP force
# ==========================================================================

def test_optmeci_bpu_composed_force_live():
    meci_mod = _ref_module("multioptpy.ModelFunction.opt_meci")

    coords, z, c1, c2 = _fixture()
    e1, e2, g1, g2, h1, h2 = _states(coords, z, c1, c2)

    ref = meci_mod.OptMECI()
    with contextlib.redirect_stdout(io.StringIO()):
        assert ref.calc_energy(e1, e2) == pytest.approx(0.5 * (e1 + e2))
        gp1 = np.asarray(ref.calc_grad(e1, e2, g1, g2))

    # replicate step 1: x0 = normalized diff grad, y0 = GS(mean grad, x0)
    dg = (g1 - g2).reshape(-1, 1)
    x0 = dg / np.linalg.norm(dg)
    gm = 0.5 * (g1 + g2).reshape(-1, 1)
    y0 = gm - float((gm.T @ x0).item()) * x0
    y0 = y0 / np.linalg.norm(y0)
    p = np.eye(9) - x0 @ x0.T - y0 @ y0.T
    # NOTE: gap force = 2 dE x_hat — WITHOUT |g1-g2| (not a true gradient)
    expect = (2.0 * (e1 - e2) * x0 + p @ gm).reshape(3, 3)
    assert np.allclose(gp1, expect, atol=1e-12)
    assert np.allclose(np.asarray(ref.prev_y_vec), y0, atol=1e-12)

    # step 2 at a new point: Eq-4 update of y
    g1b = g1 + 0.05 * np.random.default_rng(4).normal(size=(3, 3))
    g2b = g2 - 0.03 * np.random.default_rng(5).normal(size=(3, 3))
    e1b, e2b = e1 + 0.01, e2 - 0.02
    with contextlib.redirect_stdout(io.StringIO()):
        gp2 = np.asarray(ref.calc_grad(e1b, e2b, g1b, g2b))
    dgb = (g1b - g2b).reshape(-1, 1)
    xk = dgb / np.linalg.norm(dgb)
    num = float((y0.T @ xk).item()) * x0 - float((x0.T @ xk).item()) * y0
    yk = num / np.linalg.norm(num)
    pk = np.eye(9) - xk @ xk.T - yk @ yk.T
    gmb = 0.5 * (g1b + g2b).reshape(-1, 1)
    expect2 = (2.0 * (e1b - e2b) * xk + pk @ gmb).reshape(3, 3)
    assert np.allclose(gp2, expect2, atol=1e-12)
    # y_k stays orthonormal to x_k (the BP property the update preserves)
    assert abs(float((yk.T @ xk).item())) < 1e-12

    # ours: the mesx2 composed force shares the gap+seam structure with
    # ONE projector (MESX seam is N-1 dim; MECI intersection is N-2)
    from multioptpy_tpu.calculators.two_state import TwoStateModelFunction
    ours = TwoStateModelFunction(c1, c2, kind="mesx2")
    _, g_o = ours.energy_and_gradient(jnp.asarray(coords), z)
    p1 = np.eye(9) - x0 @ x0.T
    expect_mesx = (2.0 * (e1 - e2) * x0 + p1 @ gm).reshape(3, 3)
    assert np.allclose(np.asarray(g_o), expect_mesx, atol=1e-10)


# ==========================================================================
# BITSS: kappa update parity + the per-call distance halving quirk
# ==========================================================================

def test_bitss_kappa_parity_and_distance_halving_live():
    bmod = _ref_module(
        "multioptpy.ModelFunction.binary_image_ts_search_model_function")
    from multioptpy_tpu.calculators.two_state import BITSSCalculator

    rng = np.random.default_rng(280)
    xa = rng.normal(size=(3, 3))
    xb = xa + rng.normal(scale=0.8, size=(3, 3))
    z = jnp.array([1, 1, 1])
    c = _Quad(rng.normal(size=(3, 3)), k=1.1, e0=0.0)
    e1, g1 = c.energy_and_gradient(jnp.asarray(xa), z)
    e2, g2 = c.energy_and_gradient(jnp.asarray(xb), z)
    e1, e2 = float(e1), float(e2)
    g1, g2 = np.asarray(g1), np.asarray(g2)

    ref = bmod.BITSSModelFunction(xa.copy(), xb.copy())
    d0 = float(np.linalg.norm(xa - xb))
    assert ref.d == pytest.approx(d0)

    # iter=0 triggers the kappa update, then d <- 0.5 d (f = 0.5)
    e_ref = ref.calc_energy(e1, e2, xa, xb, g1, g2, iter=0)
    assert ref.d == pytest.approx(0.5 * d0)

    # our update_kappas reproduces kappa_e / kappa_d exactly (the E_B
    # floor only engages below 5% of the initial gap — not here)
    ours = BITSSCalculator(c, 3)
    packed = BITSSCalculator.pack(jnp.asarray(xa), jnp.asarray(xb))
    ke, kd = ours.update_kappas(packed, z, alpha=ref.alpha, beta=ref.beta)
    assert ke == pytest.approx(ref.kappa_e, rel=1e-9)
    assert kd == pytest.approx(ref.kappa_d, rel=1e-9)

    # energy formula parity with matched target distance + kappas
    ours.d_target = ref.d
    ours.kappa_e, ours.kappa_d = ref.kappa_e, ref.kappa_d
    e_ours = float(ours.energy(packed, ours.pack_z(z)))
    assert e_ours == pytest.approx(e_ref, rel=1e-9)

    # QUIRK: every further calc_energy call halves d again, even with no
    # geometry change and no kappa update (iter=1 skips the update)
    ref.calc_energy(e1, e2, xa, xb, g1, g2, iter=1)
    assert ref.d == pytest.approx(0.25 * d0)
    # ours only contracts when the driver calls contract()
    before = ours.d_target
    float(ours.energy(packed, ours.pack_z(z)))
    assert ours.d_target == before
