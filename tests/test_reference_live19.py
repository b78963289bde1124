"""LIVE parity wave 19: the Ayala-Schlegel QSMv2 tangent machinery and the
energy-weighted Wilson-B NEB (EWBNEB) — the reference's actual code
executed on shared bands, side by side with our neb_forces variants.

Conventions learned by execution (ref: MEP/pathopt_qsmv2_force.py,
pathopt_ewbneb_force.py):

  * QSMv2's _calculate_all_tangents returns MINUS the Ayala-Schlegel
    tangents (the trailing -1 at pathopt_qsmv2_force.py:136); our
    ayala_tangents returns the unnegated propagated tangent — interior
    tangents agree elementwise up to that global sign (1e-8), endpoints
    zero on both sides. Since the QSMv2 force only uses the tangent in a
    projector, its interior forces equal our `qsm2` variant EXACTLY.
  * EWBNEB's per-image spring-constant schedule is INVERTED relative to
    the paper it cites (Asgeirsson et al. JCTC 17 (2021) 4929, eq. 2)
    AND to our ewbneb: at the highest-energy image alpha = 1 gives
    k = k_lower (softest spring at the barrier, ewbneb:62), while the
    published scheme and ours stiffen toward the barrier. Pinned at
    both ends of the schedule.
  * EWBNEB's interior force is exactly -(per-atom perpendicular g)
    - k_i u_fwd + k_{i-1} u_bwd with per-IMAGE unit chords u — its
    Wilson-B projection (orthonormal per-atom rows, B+ = B^T) reduces
    to the same per-atom perpendicular projection as our
    _per_atom_tangents on monotonic bands; pinned by exact
    reimplementation through our tangent helper.
  * The mixed-branch bisection weights in calc_project_out_grad use
    ABSOLUTE energy differences normalized to a + b = 1 — unlike the
    NEB2/LUP family's signed-delta quirk (wave 5) — another internal
    inconsistency across the reference's force laws (documented; the
    monotonic fixtures here never enter that branch).

Ref anchors: MEP/pathopt_qsmv2_force.py:19-201,
pathopt_ewbneb_force.py:21-117 (schedule + assembly), :139-171
(projection), Coordinate/redundant_coordinate.py (pBmat transforms).
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


def _peaked_band(n_images=7, n_atoms=3, seed=190):
    """Band with an interior energy peak (image 3) — exercises the Ayala
    downhill propagation on both sides."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_atoms, 3)) * 2.0
    step = rng.standard_normal((n_atoms, 3))
    geoms = np.array([base + i * step + 0.1 * rng.standard_normal(
        (n_atoms, 3)) for i in range(n_images)])
    ts = np.linspace(0.0, 1.0, n_images)
    energies = -0.5 + 0.3 * np.exp(-((ts - 0.45) / 0.2) ** 2)
    grads = rng.standard_normal((n_images, n_atoms, 3))
    return geoms, energies, grads


def _monotonic_band(n_images=6, n_atoms=3, seed=191):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_atoms, 3)) * 2.0
    step = rng.standard_normal((n_atoms, 3))
    geoms = np.array([base + i * step + 0.12 * rng.standard_normal(
        (n_atoms, 3)) for i in range(n_images)])
    energies = np.sort(np.linspace(-1.0, -0.3, n_images)
                       + 0.005 * rng.standard_normal(n_images))
    grads = rng.standard_normal((n_images, n_atoms, 3))
    return geoms, energies, grads


# ==========================================================================
# Ayala-Schlegel tangents: ref == -ours
# ==========================================================================

def test_ayala_tangents_live_vs_ours():
    mod = _ref_module("multioptpy.MEP.pathopt_qsmv2_force")
    from multioptpy_tpu.drivers.neb import ayala_tangents

    geoms, energies, grads = _peaked_band()
    obj = mod.CaluculationQSMv2()
    t_ref = np.asarray(obj._calculate_all_tangents(geoms, energies))
    t_ours = np.asarray(ayala_tangents(jnp.asarray(geoms),
                                       jnp.asarray(energies)))
    # endpoints zero on both sides
    np.testing.assert_allclose(t_ref[0], 0.0, atol=1e-15)
    np.testing.assert_allclose(t_ref[-1], 0.0, atol=1e-15)
    np.testing.assert_allclose(t_ours[0], 0.0, atol=1e-15)
    np.testing.assert_allclose(t_ours[-1], 0.0, atol=1e-15)
    # interior: ref carries a global -1 (qsmv2:136); magnitudes unit
    np.testing.assert_allclose(t_ref[1:-1], -t_ours[1:-1], atol=1e-8)
    for i in range(1, len(geoms) - 1):
        np.testing.assert_allclose(np.linalg.norm(t_ref[i]), 1.0,
                                   atol=1e-10)


def test_qsmv2_force_live_equals_ours():
    mod = _ref_module("multioptpy.MEP.pathopt_qsmv2_force")
    from multioptpy_tpu.drivers.neb import neb_forces

    geoms, energies, grads = _peaked_band(seed=192)
    with contextlib.redirect_stdout(io.StringIO()):
        f_ref = np.asarray(mod.CaluculationQSMv2().calc_force(
            geoms.copy(), energies, grads.copy(), 0, ["O", "H", "H"]))
    f_ours = np.asarray(neb_forces(jnp.asarray(geoms),
                                   jnp.asarray(energies),
                                   jnp.asarray(grads), variant="qsm2"))
    # interior: the tangent enters only through a projector -> the global
    # tangent sign cancels and the forces agree exactly
    np.testing.assert_allclose(f_ref[1:-1], f_ours[1:-1], atol=1e-8)
    # endpoints: ref relaxes with -g, ours freezes (driver masks them)
    np.testing.assert_allclose(f_ref[0], -grads[0], atol=1e-15)
    np.testing.assert_allclose(f_ref[-1], -grads[-1], atol=1e-15)
    np.testing.assert_allclose(f_ours[0], 0.0, atol=1e-15)


# ==========================================================================
# EWBNEB: inverted spring schedule + exact assembly
# ==========================================================================

def _ref_spring_schedule(obj, energies):
    """Reimplementation of ewbneb:47-66 for expectation-building."""
    n = len(energies)
    max_e = max(energies)
    ref_e = energies[-1] if energies[0] > energies[-1] else energies[0]
    ks = []
    for i in range(n):
        if i in (0, n - 1):
            ks.append(0.0)
            continue
        denom = max(max_e - ref_e, 1e-8)
        alpha = (energies[i] - ref_e) / denom
        if energies[i] < ref_e:
            ks.append(obj.lower_spring_constant)
        elif energies[i] > ref_e:
            ks.append(obj.upper_spring_constant * (1 - alpha)
                      + alpha * obj.lower_spring_constant)
        else:
            ks.append(0.0)
    return np.array(ks)


def test_ewbneb_spring_schedule_live_inverted_vs_paper():
    mod = _ref_module("multioptpy.MEP.pathopt_ewbneb_force")
    obj = mod.CaluculationEWBNEB()
    assert obj.upper_spring_constant == 0.005
    assert obj.lower_spring_constant == 0.0001

    energies = np.array([-1.0, -0.8, -0.2, -0.75, -0.95])
    ks = _ref_spring_schedule(obj, energies)
    # at the barrier (alpha=1): k == k_lower — SOFTEST spring at the TS,
    # the inverse of JCTC 17 4929 eq. 2 (and of our ewbneb variant)
    np.testing.assert_allclose(ks[2], obj.lower_spring_constant,
                               atol=1e-15)
    # exact schedule value at image 1 (alpha = 0.25) — and the schedule
    # DECREASES with energy: the inversion
    alpha1 = (energies[1] - energies[0]) / (energies[2] - energies[0])
    np.testing.assert_allclose(
        ks[1], obj.upper_spring_constant * (1 - alpha1)
        + alpha1 * obj.lower_spring_constant, atol=1e-15)
    assert ks[1] > ks[2]  # higher energy -> SOFTER spring

    # ours stiffens TOWARD the barrier on the same profile
    from multioptpy_tpu.drivers.neb import neb_forces  # noqa: F401 (import
    # kept for parity of environment); our k(E_seg) formula:
    k_u, k_l = 0.005, 1e-4
    e_seg = np.maximum(energies[:-1], energies[1:])
    e_max, e_ref = energies.max(), max(energies[0], energies[-1])
    k_seg = np.where(e_seg > e_ref,
                     k_u - (k_u - k_l) * (e_max - e_seg)
                     / max(e_max - e_ref, 1e-12), k_l)
    assert k_seg[1] == pytest.approx(k_u)   # barrier segment: STIFFEST
    assert k_seg[-1] < 0.3 * k_u            # low-energy segment: softer
    assert np.all(k_seg <= k_seg[1] + 1e-15)


def test_ewbneb_force_live_exact_reimplementation():
    mod = _ref_module("multioptpy.MEP.pathopt_ewbneb_force")
    from multioptpy_tpu.drivers.neb import _per_atom_tangents

    geoms, energies, grads = _monotonic_band()
    with contextlib.redirect_stdout(io.StringIO()):
        f_ref = np.asarray(mod.CaluculationEWBNEB().calc_force(
            geoms.copy(), energies, grads.copy(), 0, ["O", "H", "H"]))

    obj = mod.CaluculationEWBNEB()
    ks = _ref_spring_schedule(obj, energies)
    t_atom = np.asarray(_per_atom_tangents(jnp.asarray(geoms),
                                           jnp.asarray(energies)))
    expect = [-grads[0]]
    for i in range(1, len(geoms) - 1):
        g = grads[i]
        t = t_atom[i]
        g_perp = g - np.sum(g * t, axis=1, keepdims=True) * t
        fwd = geoms[i + 1] - geoms[i]
        bwd = geoms[i] - geoms[i - 1]
        u_fwd = fwd / np.linalg.norm(fwd)     # per-IMAGE unit chords
        u_bwd = bwd / np.linalg.norm(bwd)
        spring = ks[i] * u_fwd - ks[i - 1] * u_bwd
        expect.append(-(g_perp + spring))
    expect.append(-grads[-1])
    np.testing.assert_allclose(f_ref, np.array(expect), atol=1e-10)
