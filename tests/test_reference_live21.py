"""LIVE parity wave 21: the GPNEB Gaussian-process machinery — the
reference's closed-form RBF kernel blocks and energy+force regressor
executed side by side with our autodiff gradient-enhanced GP.

Conventions learned by execution (ref: MEP/pathopt_gpneb_force.py):

  * rbf_kernel_chunked / _grad_x_chunked / _hessian_chunked are the
    exact closed forms of k = sigma_f^2 exp(-|d|^2/2l^2), dk/dx1, and
    the cross-Hessian d2k/dx1 dx2 — pinned against jax.grad/jacfwd of
    our _rbf to 1e-12, including chunk-boundary handling (chunk_size
    smaller than N).
  * The regressor trains on energies and FORCES (F = -g), but its K_EF
    block is assembled as grad_X[j,i] — MINUS the true Cov(E,F) block —
    so the full block matrix is ASYMMETRIC (K_EF = -K_FE^T).
    np.linalg.cholesky silently reads only the lower triangle (the
    correct K_FE), which rescues alpha and makes FORCE predictions
    interpolate to 1e-10; but predict_energy_and_forces's K_star_EF
    carries the same un-rescued sign error, so every ENERGY prediction
    adds the force contribution with the wrong sign (training-point
    energies off by O(10)). Negating E_part2 restores 1e-10
    interpolation — pinned. GPNEB's surrogate relaxation upstream
    therefore runs on valid forces but bogus energies.
  * Our steppers/gp.gp_posterior_energy — the same gradient-enhanced GP
    assembled by autodiff — interpolates BOTH energies and gradients on
    the shared data and predicts held-out quadratic points correctly.

Ref anchors: MEP/pathopt_gpneb_force.py:23-153 (kernels), :154-345
(regressor blocks, alpha, predict).
"""

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


# ==========================================================================
# kernel closed forms vs our autodiff
# ==========================================================================

def test_rbf_kernel_blocks_live_vs_autodiff():
    gp = _ref_module("multioptpy.MEP.pathopt_gpneb_force")
    from multioptpy_tpu.steppers.gp import _rbf

    rng = np.random.default_rng(210)
    n1, n2, d = 7, 5, 4
    x1 = rng.standard_normal((n1, d))
    x2 = rng.standard_normal((n2, d))
    sigma_f, ls = 1.3, 0.9

    # values (chunk boundary exercised: chunk_size=3 < n1)
    k_ref = gp.rbf_kernel_chunked(x1, x2, sigma_f, ls, chunk_size=3)
    k_ours = np.asarray(jax.vmap(lambda a: jax.vmap(
        lambda b: sigma_f ** 2 * _rbf(a, b, ls))(jnp.asarray(x2)))(
        jnp.asarray(x1)))
    np.testing.assert_allclose(k_ref, k_ours, rtol=1e-12)

    # dk/dx1
    g_ref = gp.rbf_kernel_grad_x_chunked(x1, x2, sigma_f, ls, chunk_size=3)
    g_ours = np.asarray(jax.vmap(lambda a: jax.vmap(
        lambda b: jax.grad(lambda aa: sigma_f ** 2 * _rbf(aa, b, ls))(a))(
        jnp.asarray(x2)))(jnp.asarray(x1)))
    np.testing.assert_allclose(g_ref, g_ours, atol=1e-12)

    # d2k / dx1 dx2
    h_ref = gp.rbf_kernel_hessian_chunked(x1, x2, sigma_f, ls, chunk_size=2)
    h_ours = np.asarray(jax.vmap(lambda a: jax.vmap(
        lambda b: jax.jacfwd(lambda aa: jax.grad(
            lambda bb: sigma_f ** 2 * _rbf(aa, bb, ls))(b))(a))(
        jnp.asarray(x2)))(jnp.asarray(x1)))
    np.testing.assert_allclose(h_ref, h_ours, atol=1e-12)


# ==========================================================================
# regressor: interpolation property + cross-implementation agreement
# ==========================================================================

def _quadratic(d=4, seed=211):
    rng = np.random.default_rng(seed)
    a_half = rng.standard_normal((d, d)) * 0.3
    a_mat = a_half @ a_half.T + 0.5 * np.eye(d)
    b = rng.standard_normal(d) * 0.2

    def f(x):
        return 0.5 * x @ a_mat @ x + b @ x

    def grad(x):
        return a_mat @ x + b

    return f, grad


def _fit_ref_gp(gp_mod, x_train, e_train, f_train, theta):
    reg = gp_mod.GaussianProcessRegressor()
    reg.X, reg.E, reg.F = x_train, e_train, f_train
    reg.chunk_size = 64
    reg.theta_opt = theta
    reg._compute_alpha()
    return reg


def test_gp_regressor_live_force_ok_energy_sign_bug():
    """The reference regressor's FORCE predictions interpolate the
    training data to 1e-10, but its ENERGY predictions are broken
    upstream: K_EF is assembled as grad_X[j,i] = -(the true Cov(E,F)
    block), making the block matrix ASYMMETRIC (K_EF = -K_FE^T);
    np.linalg.cholesky silently reads only the LOWER triangle (the
    correct K_FE), which rescues alpha — but predict's K_star_EF
    carries the same sign error un-rescued, so every energy prediction
    adds the force contribution with the wrong sign. Pinned: negating
    E_part2 restores 1e-10 interpolation."""
    gp_mod = _ref_module("multioptpy.MEP.pathopt_gpneb_force")

    d = 4
    f, grad = _quadratic(d)
    rng = np.random.default_rng(212)
    x_train = rng.standard_normal((6, d)) * 0.8
    e_train = np.array([f(x) for x in x_train])
    g_train = np.array([grad(x) for x in x_train])
    theta = (1.0, 1.5, 1e-6, 1e-6)  # sigma_f, l, noise_e, noise_f

    reg = _fit_ref_gp(gp_mod, x_train, e_train, -g_train, theta)

    # the assembled block matrix is NOT symmetric (K_EF = -K_FE^T)
    k_full, _ = reg._build_block_matrix_chunked(x_train, e_train, -g_train,
                                                *theta)
    asym = np.abs(k_full - k_full.T).max()
    assert asym > 0.1
    n = len(x_train)
    np.testing.assert_allclose(k_full[:n, n:], -k_full[n:, :n].T,
                               atol=1e-12)

    e_pred, f_pred = reg.predict_energy_and_forces(x_train)
    # forces interpolate (cholesky lower-triangle rescue)
    np.testing.assert_allclose(f_pred, -g_train, atol=1e-8)
    # energies do NOT
    assert np.abs(e_pred - e_train).max() > 1.0
    # negating the cross term restores exact interpolation
    sigma_f, ls = theta[0], theta[1]
    k_ee = gp_mod.rbf_kernel_chunked(x_train, x_train, sigma_f, ls)
    g_t = gp_mod.rbf_kernel_grad_x_chunked(x_train, x_train, sigma_f, ls)
    k_ef = np.transpose(g_t, (1, 0, 2))
    a_e = reg.alpha[:n]
    a_f = reg.alpha[n:].reshape(n, d)
    e_fixed = k_ee @ a_e - np.einsum("mjd,jd->m", k_ef, a_f)
    np.testing.assert_allclose(e_fixed, e_train, atol=1e-8)


def test_our_gp_posterior_correct_on_shared_data():
    """Ours (autodiff blocks, gradients as observations, centered prior)
    interpolates BOTH energies and gradients and predicts a held-out
    quadratic point to ~1e-3 — the behaviour the reference's energy path
    was meant to have."""
    from multioptpy_tpu.steppers.gp import GpState, gp_posterior_energy

    d = 4
    f, grad = _quadratic(d)
    rng = np.random.default_rng(213)
    x_train = rng.standard_normal((6, d)) * 0.8
    e_train = np.array([f(x) for x in x_train])
    g_train = np.array([grad(x) for x in x_train])

    m = 8
    state = GpState(
        x_hist=jnp.zeros((m, d)).at[:6].set(jnp.asarray(x_train)),
        e_hist=jnp.zeros((m,)).at[:6].set(jnp.asarray(e_train)),
        g_hist=jnp.zeros((m, d)).at[:6].set(jnp.asarray(g_train)),
        count=jnp.asarray(6, jnp.int32))

    for i in range(6):
        e_i = float(gp_posterior_energy(jnp.asarray(x_train[i]), state,
                                        lengthscale=1.5, noise=1e-8))
        assert abs(e_i - e_train[i]) < 1e-5

    # held-out point NEAR a training point: GP error shrinks with distance
    x_star = x_train[0] + 0.05 * rng.standard_normal(d)
    e_star = float(gp_posterior_energy(jnp.asarray(x_star), state,
                                       lengthscale=1.5, noise=1e-8))
    assert abs(e_star - f(x_star)) < 5e-3
    # and the posterior GRADIENT interpolates too (autodiff of the mean)
    g_star = np.asarray(jax.grad(
        lambda xq: gp_posterior_energy(xq, state, lengthscale=1.5,
                                       noise=1e-8))(jnp.asarray(x_train[0])))
    np.testing.assert_allclose(g_star, g_train[0], atol=1e-4)
