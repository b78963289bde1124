"""LIVE parity wave 34: GPmin — the reference's Gaussian-process
minimizer in inverse-distance coordinates executed, side by side with our
steppers/gp.py gradient-enhanced GP.

Conventions learned by execution (ref: Optimizer/gpmin.py):

  * Descriptors are 1/(R * dist_scale) over the upper-triangle pair
    distances with a min_dist floor (:223-238) — identical ordering and
    values to our inv_dist_descriptor (steppers/gp.py:87) when both
    floors are inactive; the analytic Jacobian (:240-274) matches
    central differences of the descriptor map and our jax.jacfwd to
    1e-8.
  * Kernel k = sigma_f * exp(-0.5 sum(((x1-x2)/ls)^2)) (:408) — the
    docstring's "sigma^2" IS the attribute (used unsquared, i.e.
    sigma_f is the prior variance); length_scale broadcast to
    per-dimension (0.5 default); _rbf_kernel_gradient is d/dx2 and
    _predict negates it for d/dx1 — verified against FD.
  * QUIRK (zero-mean prior on absolute energies): _predict solves
    alpha = K^-1 Y on RAW energies with no mean offset (:444-447), so
    far from the training data (in descriptor space — e.g. compressed
    geometries, where 1/R grows) the surrogate energy decays to 0 — for
    chemistry energies (~-10 Ha here) the surrogate fabricates a
    +10 Ha wall toward those regions (pinned executed: prediction
    at a descriptor-distant point is ~0, not ~-10). Ours subtracts the training
    mean and adds it back (gp.py:74-84) — far-field prediction equals
    the mean (pinned).
  * First run() call (:118-135) takes a pure force step
    alpha=0.3 * f_hat * force_scale_factor=0.3, floored at
    min_step_size=0.1 and capped at trust_radius=1.0 — executed: with
    any nonzero force the first step norm is exactly 0.1 (0.09 floors
    up), independent of the force magnitude; run() returns the NEGATED
    move (driver-subtract convention, gpmin.py:178).
  * _select_diverse_points (:347) greedily maximizes the minimum
    descriptor-space distance to the already-selected set, ALWAYS
    seeding with the most recent point — pinned on a 1-D chain where
    greedy max-min has a unique answer.

Ref anchors: Optimizer/gpmin.py:8-63 (defaults), :223-274, :375-470,
:64-135, :322-373; ours: steppers/gp.py:34-103.
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


def _gpmin(**kw):
    mod = _ref_module("multioptpy.Optimizer.gpmin")
    return mod.GPmin(display_flag=False, **kw)


def test_gpmin_descriptor_and_jacobian_live():
    from multioptpy_tpu.steppers.gp import inv_dist_descriptor

    g = _gpmin()
    rng = np.random.default_rng(34)
    coords = rng.normal(size=(4, 3)) * 2.0  # all pair distances > 0.5
    g.n_dist = 6

    inv = g._cart_to_inverse_dist(coords)
    phi, n_pairs = inv_dist_descriptor(4, dist_scale=1.0, min_dist=0.5)
    assert n_pairs == 6
    ours = np.asarray(phi(jnp.asarray(coords.flatten())))
    assert np.allclose(inv, ours, atol=1e-12)

    jac = g._calc_jacobian(coords)
    jac_ours = np.asarray(jax.jacfwd(phi)(jnp.asarray(coords.flatten())))
    assert np.allclose(jac, jac_ours, atol=1e-10)
    # and against central differences of the reference's own descriptor
    eps = 1e-6
    for col in (0, 5, 11):
        d = np.zeros(12)
        d[col] = eps
        fd = (g._cart_to_inverse_dist((coords.flatten() + d).reshape(4, 3))
              - g._cart_to_inverse_dist(
                  (coords.flatten() - d).reshape(4, 3))) / (2 * eps)
        assert np.allclose(jac[:, col], fd, atol=1e-7)


def test_gpmin_kernel_conventions_live():
    g = _gpmin()
    g.n_dist = 6
    g.length_scale = np.ones(6) * 0.5

    rng = np.random.default_rng(340)
    x1, x2 = rng.normal(size=6), rng.normal(size=6)
    k = g._rbf_kernel(x1, x2)
    expect = 1.0 * np.exp(-0.5 * np.sum(((x1 - x2) / 0.5) ** 2))
    assert k == pytest.approx(expect, rel=1e-12)

    # gradient convention: returned vector is d k / d x2
    grad = g._rbf_kernel_gradient(x1, x2)
    eps = 1e-6
    for j in range(3):
        d = np.zeros(6)
        d[j] = eps
        fd = (g._rbf_kernel(x1, x2 + d) - g._rbf_kernel(x1, x2 - d)) / (
            2 * eps)
        assert grad[j] == pytest.approx(fd, rel=1e-5, abs=1e-10)


def test_gpmin_zero_mean_prior_quirk_live():
    g = _gpmin()
    rng = np.random.default_rng(341)
    coords_a = rng.normal(size=(3, 3)) * 2.0
    coords_b = coords_a + 0.1

    g.dim = 9
    g.n_atoms = 3
    g.n_dist = 3
    g.length_scale = np.ones(3) * 0.5
    xa = g._cart_to_inverse_dist(coords_a)
    xb = g._cart_to_inverse_dist(coords_b)
    g.X = np.array([xa, xb])
    g.Y = np.array([-10.0, -10.01])   # absolute chemistry-scale energies
    g._update_kernel()

    # compressed geometry -> inverse distances GROW -> descriptor-space
    # far point (scaling coords UP shrinks 1/R toward the training data,
    # so the far side of this descriptor space is the compressed one)
    far_coords = coords_a * 0.25
    far = g._cart_to_inverse_dist(far_coords)
    e_far, _ = g._predict(far, g._calc_jacobian(far_coords))
    # zero-mean prior: the surrogate returns ~0, a +10 Ha wall
    assert abs(e_far) < 1.0
    # near the data it interpolates fine
    e_near, _ = g._predict(xa, g._calc_jacobian(coords_a))
    assert e_near == pytest.approx(-10.0, abs=0.05)

    # ours: mean-offset GP — the far-field prediction is the data mean
    from multioptpy_tpu.steppers.gp import (gp_init, gp_posterior_energy,
                                            gp_step)
    state = gp_init(9)
    for c, e in ((coords_a, -10.0), (coords_b, -10.01)):
        _, state = gp_step(state, jnp.asarray(c.flatten()),
                           jnp.asarray(e),
                           jnp.zeros(9, dtype=jnp.float64))
    e_far_ours = float(gp_posterior_energy(
        jnp.asarray((coords_a * 0.25).flatten()), state))
    assert e_far_ours == pytest.approx(-10.005, abs=0.05)


def test_gpmin_first_step_is_floored_force_step_live():
    g = _gpmin()
    rng = np.random.default_rng(342)
    geom = rng.normal(size=(3, 3)) * 2.0
    grad = rng.normal(size=(3, 3)) * 1e-3  # small force

    with contextlib.redirect_stdout(io.StringIO()):
        step = np.asarray(g.run(geom, grad, B_e=-10.0)).flatten()
    # alpha * 0.3 = 0.09 < min_step_size -> floored to exactly 0.1
    assert np.linalg.norm(step) == pytest.approx(0.1, rel=1e-12)
    # sign convention: run() returns -move (the driver SUBTRACTS it,
    # like RSIRFO), so the returned vector points along +gradient
    f = -grad.flatten()
    cos = step @ f / (np.linalg.norm(step) * np.linalg.norm(f))
    assert cos == pytest.approx(-1.0, abs=1e-12)


def test_gpmin_diverse_selection_live():
    g = _gpmin(selection_method="diverse")
    # descriptor-space points on a line: 0, 1, 2, ..., 9 (1-D embedding)
    g.X_all = np.linspace(0.0, 9.0, 10).reshape(-1, 1)
    picked = g._select_diverse_points(3)
    picked = sorted(int(i) for i in picked)
    # most recent (9) always in; greedy max-min adds the far end (0),
    # then the midpoint region
    assert 9 in picked and 0 in picked
    assert picked == [0, 4, 9] or picked == [0, 5, 9]
