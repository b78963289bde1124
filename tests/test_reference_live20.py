"""LIVE parity wave 20: the Wilson-B-constrained NEB family (BNEB, BNEB2,
BNEB3) — the reference's actual code executed on shared bands, side by
side with our bneb/bneb2/bneb3 variants.

Conventions learned by execution (ref: MEP/pathopt_bneb_force.py):

  * BNEB interior force is the pure per-atom perpendicular gradient (no
    springs) — identical to LUP's (wave 18) and to our `bneb` variant to
    1e-12 on monotonic bands. Its B-matrix rows are unit per-atom chords
    so B+ = B^T and the pBmat projection reduces to per-atom tangent
    projection.
  * BNEB's climbing-image guard `(i != 1 or i != nnode-2)` (:54) is a
    TAUTOLOGY (always true; `or` where `and` was meant — EWBNEB has the
    corrected `and`), so CI applies even to image 1; and its CI force is
    -2 g_par ONLY (the -g_perp relaxation term of JCP 113 9901 is
    dropped), while neighbours of the maximum get their whole force
    scaled by 0.001. All three behaviours pinned as executed.
  * BNEB2's two-stage projection — pseudo-inverse removal of the per-atom
    components along BOTH neighbour directions, then along the prev->next
    chord — equals our closed-form per-atom 2x2 Gram solve (`bneb2`) to
    1e-8 on generic bands.
  * BNEB3 = per-atom tangent projection + a 5-point second-difference
    spring (spring_force_const = 0.05) applied only to images
    2 <= i <= nnode-3; pinned by exact reimplementation. Its spring is
    the hand-assembled gradient of 0.5 k sum (L_j - L_{j-1})^2 restricted
    to adjacent terms; our `bneb3` takes jax.grad of that functional
    directly (documented redesign).

Ref anchors: MEP/pathopt_bneb_force.py:21-120 (BNEB), :226-305 (BNEB2),
:305-443 (BNEB3).
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


def _band(n_images=7, n_atoms=3, seed=200, peaked=False):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_atoms, 3)) * 2.0
    step = rng.standard_normal((n_atoms, 3))
    geoms = np.array([base + i * step + 0.12 * rng.standard_normal(
        (n_atoms, 3)) for i in range(n_images)])
    if peaked:
        ts = np.linspace(0.0, 1.0, n_images)
        energies = -0.5 + 0.3 * np.exp(-((ts - 0.5) / 0.18) ** 2)
    else:
        energies = np.sort(np.linspace(-1.0, -0.3, n_images)
                           + 0.005 * rng.standard_normal(n_images))
    grads = rng.standard_normal((n_images, n_atoms, 3))
    return geoms, energies, grads


def _run(cls, geoms, energies, grads, optimize_num=0, **kw):
    with contextlib.redirect_stdout(io.StringIO()):
        return np.asarray(cls(**kw).calc_force(
            geoms.copy(), np.asarray(energies), grads.copy(),
            optimize_num, ["O", "H", "H"]))


def _per_atom_tau(geoms, energies):
    from multioptpy_tpu.drivers.neb import _per_atom_tangents

    return np.asarray(_per_atom_tangents(jnp.asarray(geoms),
                                         jnp.asarray(energies)))


# ==========================================================================
# BNEB
# ==========================================================================

def test_bneb_live_equals_ours():
    mod = _ref_module("multioptpy.MEP.pathopt_bneb_force")
    from multioptpy_tpu.drivers.neb import neb_forces

    geoms, energies, grads = _band()
    f_ref = _run(mod.CaluculationBNEB, geoms, energies, grads)
    f_ours = np.asarray(neb_forces(jnp.asarray(geoms),
                                   jnp.asarray(energies),
                                   jnp.asarray(grads), variant="bneb",
                                   optimize_endpoints=True))
    np.testing.assert_allclose(f_ref[1:-1], f_ours[1:-1], atol=1e-12)
    np.testing.assert_allclose(f_ref[0], -grads[0], atol=1e-15)
    np.testing.assert_allclose(f_ref[-1], -grads[-1], atol=1e-15)


def _bneb_ci_expect(geoms, energies, grads, i):
    """The executed BNEB CI force at a local-maximum image i: the mixed
    tangent branch applies TWO per-atom projections weighted a/b (abs
    energy differences, normalized), not one blended-tangent projection —
    total = -2 (w+ P+ + w- P-) g (pathopt_bneb_force.py:26-102)."""
    g = grads[i]
    u_p = geoms[i + 1] - geoms[i]
    u_p = u_p / (np.linalg.norm(u_p, axis=1, keepdims=True) + 1e-15)
    u_m = geoms[i] - geoms[i - 1]
    u_m = u_m / (np.linalg.norm(u_m, axis=1, keepdims=True) + 1e-15)
    max_e = max(abs(energies[i + 1] - energies[i]),
                abs(energies[i] - energies[i - 1]))
    min_e = min(abs(energies[i + 1] - energies[i]),
                abs(energies[i] - energies[i - 1]))
    a = max_e / (max_e + min_e + 1e-8)
    b = min_e / (max_e + min_e + 1e-8)
    if energies[i - 1] < energies[i + 1]:
        w_p, w_m = a, b
    else:
        w_p, w_m = b, a
    p_p = np.sum(g * u_p, axis=1, keepdims=True) * u_p
    p_m = np.sum(g * u_m, axis=1, keepdims=True) * u_m
    return -2.0 * (w_p * p_p + w_m * p_m)


def test_bneb_ci_branch_live_quirks():
    """CI on (optimize_num > APPLY_CI_NEB): the maximum image's force is
    -2 g_par with NO perpendicular relaxation, its neighbours' whole
    forces are scaled by 0.001, and — because the `(i != 1 or ...)` guard
    is a tautology — CI applies even when the maximum is image 1."""
    mod = _ref_module("multioptpy.MEP.pathopt_bneb_force")

    geoms, energies, grads = _band(peaked=True, seed=201)
    peak = int(np.argmax(energies))
    assert 1 < peak < len(geoms) - 2
    f_ci = _run(mod.CaluculationBNEB, geoms, energies, grads,
                optimize_num=1, APPLY_CI_NEB=0)
    f_plain = _run(mod.CaluculationBNEB, geoms, energies, grads,
                   optimize_num=0, APPLY_CI_NEB=99999)

    np.testing.assert_allclose(f_ci[peak],
                               _bneb_ci_expect(geoms, energies, grads,
                                               peak), atol=1e-10)
    # neighbours: whole force scaled by 0.001
    np.testing.assert_allclose(f_ci[peak - 1], 0.001 * f_plain[peak - 1],
                               atol=1e-14)
    np.testing.assert_allclose(f_ci[peak + 1], 0.001 * f_plain[peak + 1],
                               atol=1e-14)

    # tautology: with the maximum AT image 1, CI still applies there
    energies2 = np.array(sorted(np.linspace(-1.0, -0.4, len(geoms)),
                                reverse=True))
    energies2[1] = -0.2   # local max at image 1
    f_ci2 = _run(mod.CaluculationBNEB, geoms, energies2, grads,
                 optimize_num=1, APPLY_CI_NEB=0)
    np.testing.assert_allclose(f_ci2[1],
                               _bneb_ci_expect(geoms, energies2, grads, 1),
                               atol=1e-10)


# ==========================================================================
# BNEB2
# ==========================================================================

def test_bneb2_live_equals_our_gram_solve():
    mod = _ref_module("multioptpy.MEP.pathopt_bneb_force")
    from multioptpy_tpu.drivers.neb import neb_forces

    geoms, energies, grads = _band(seed=202)
    f_ref = _run(mod.CaluculationBNEB2, geoms, energies, grads)
    f_ours = np.asarray(neb_forces(jnp.asarray(geoms),
                                   jnp.asarray(energies),
                                   jnp.asarray(grads), variant="bneb2",
                                   optimize_endpoints=True))
    np.testing.assert_allclose(f_ref[1:-1], f_ours[1:-1], atol=1e-8)
    np.testing.assert_allclose(f_ref[0], -grads[0], atol=1e-15)


# ==========================================================================
# BNEB3
# ==========================================================================

def test_bneb3_live_exact_reimplementation():
    mod = _ref_module("multioptpy.MEP.pathopt_bneb_force")

    geoms, energies, grads = _band(seed=203, n_images=8)
    f_ref = _run(mod.CaluculationBNEB3, geoms, energies, grads)

    k = 0.05  # spring_force_const (bneb3 __init__)
    t_atom = _per_atom_tau(geoms, energies)
    n = len(geoms)
    expect = [-grads[0]]
    for i in range(1, n - 1):
        g = grads[i]
        t = t_atom[i]
        perp = g - np.sum(g * t, axis=1, keepdims=True) * t
        if 2 <= i <= n - 3:
            c0, c1, c2, c3, c4 = (geoms[i - 2], geoms[i - 1], geoms[i],
                                  geoms[i + 1], geoms[i + 2])
            f1 = k * (np.linalg.norm(c1 - c2) - np.linalg.norm(c0 - c1)) \
                * (c1 - c2) / (np.linalg.norm(c1 - c2) + 1e-15)
            f2 = k * (np.linalg.norm(c2 - c3) - np.linalg.norm(c1 - c2)) \
                * (-(c1 - c2) / (np.linalg.norm(c1 - c2) + 1e-15)
                   - (c2 - c3) / (np.linalg.norm(c2 - c3) + 1e-15))
            f3 = k * (np.linalg.norm(c3 - c4) - np.linalg.norm(c2 - c3)) \
                * (c3 - c4) / (np.linalg.norm(c3 - c4) + 1e-15)
            spring = f1 + f2 + f3
        else:
            spring = np.zeros_like(g)
        expect.append(-perp - spring)
    expect.append(-grads[-1])
    np.testing.assert_allclose(f_ref, np.array(expect), atol=1e-10)

    # ours: same projection family, spring = jax.grad of the spacing
    # functional — finite and endpoint-consistent on the same band
    from multioptpy_tpu.drivers.neb import neb_forces

    f_ours = np.asarray(neb_forces(jnp.asarray(geoms),
                                   jnp.asarray(energies),
                                   jnp.asarray(grads), variant="bneb3"))
    assert np.all(np.isfinite(f_ours))

    # shared projection part: ours == -perp - grad(spacing penalty); the
    # ref's spring is zero at image 1, so the difference there must be
    # exactly our penalty gradient
    def spacing_penalty(path):
        seg = path[1:] - path[:-1]
        ell = jnp.sqrt(jnp.sum(seg ** 2, axis=(1, 2)) + 1e-14)
        return 0.5 * 0.05 * jnp.sum((ell[1:] - ell[:-1]) ** 2)

    pen_grad = np.asarray(jax.grad(spacing_penalty)(jnp.asarray(geoms)))
    np.testing.assert_allclose(f_ours[1], f_ref[1] - pen_grad[1],
                               atol=1e-10)
