"""LIVE parity wave 18: the remaining MEP force-law classes (LUP, OM,
DNEB, NESB) — the reference's actual numpy code executed on shared
multi-atom bands, side by side with our neb_forces variants.

Conventions learned by execution (ref: MEP/pathopt_{lup,om,dneb,nesb}
_force.py; plain NEB2/CI quirks were pinned in wave 5):

  * All four share the per-ATOM bisection tangent of NEB2. On a strictly
    monotonic-energy band that tangent is the normalized per-atom chord
    to the next image — exactly our _per_atom_tangents — and the
    reference LUP's interior force equals our `bneb` variant's per-atom
    perpendicular force to 1e-12 (a genuine cross-code equality; our
    `lup` projects per IMAGE, the published Ulitsky-Elber form).
  * OM (Onsager-Machlup action springs, JCP 120 10880-flavoured):
    interior force = -perp(g) - k(|d+|-|d-|)tau + OM_par + f_phi
    OM_perp, with OM_action = k_OM (x+ + x- - 2x + L- - L0),
    L = -(dt/(m*damp)) g, and a per-image cosine switch f_phi; the
    "parallel" OM term multiplies by dot(tau,tau) == 1 — a DEAD
    projection (the action force is added whole, not projected). Our
    `om` is a documented energy-weighted-spring redesign.
  * DNEB executes NEITHER the published doubly-nudged construction
    (JCP 120, 2082) nor its own docstring: its "perpendicular spring"
    is the elementwise broadcast s*(1 - tau(x)tau) of the SCALAR spring
    magnitude s (np.dot(0-d, 1-d) broadcasting, dneb:118), and its
    arctan switching factor divides |fpp|^2 BY ITSELF so the switch is
    the constant 2/pi*arctan(1) = 0.5 (dneb:120). Pinned as executed;
    ours implements the published projection form.
  * NESB has a STALE-VARIABLE spring bug upstream: the assembly loop's
    spring term uses `tau[f]` — the leftover tangent of the LAST
    interior image from the first loop — for EVERY image
    (pathopt_nesb_force.py:182 vs the correct tau_list[i][f] used two
    lines below). Pinned exactly at image 1, whose stiffness force is
    zero by construction: the executed force is -perp(tau_1) -
    s*tau_LAST, and the correct-tangent form does not reproduce it.
  * All four return plain -g at both endpoints and carry the
    nanmean-normalization guard (> 10) which never fires on sane bands.

Ref anchors: MEP/pathopt_lup_force.py:20-112, pathopt_om_force.py:18-153,
pathopt_dneb_force.py:20-129, pathopt_nesb_force.py:21-204.
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


def _band(n_images=6, n_atoms=3, seed=180):
    """Strictly-monotonic-energy band: the per-atom tangent is the
    normalized chord to the NEXT image everywhere (no extrema quirks)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_atoms, 3)) * 2.0
    step = rng.standard_normal((n_atoms, 3))
    geoms = np.array([base + i * step + 0.15 * rng.standard_normal(
        (n_atoms, 3)) for i in range(n_images)])
    energies = np.linspace(-1.0, -0.2, n_images) \
        + 0.01 * rng.standard_normal(n_images)
    energies = np.sort(energies)
    grads = rng.standard_normal((n_images, n_atoms, 3))
    return geoms, energies, grads


def _per_atom_tau(geoms, energies):
    from multioptpy_tpu.drivers.neb import _per_atom_tangents

    return np.asarray(_per_atom_tangents(jnp.asarray(geoms),
                                         jnp.asarray(energies)))


def _run_ref(cls, geoms, energies, grads, elements=None):
    n = geoms.shape[1]
    elements = elements or (["O"] + ["H"] * (n - 1))
    with contextlib.redirect_stdout(io.StringIO()):
        return np.asarray(cls().calc_force(
            geoms.copy(), np.asarray(energies), grads.copy(), 0, elements))


# ==========================================================================
# LUP == our per-atom perpendicular force (the bneb variant)
# ==========================================================================

def test_lup_live_equals_our_per_atom_perp():
    mod = _ref_module("multioptpy.MEP.pathopt_lup_force")
    from multioptpy_tpu.drivers.neb import neb_forces

    geoms, energies, grads = _band()
    f_ref = _run_ref(mod.CaluculationLUP, geoms, energies, grads)

    f_ours = np.asarray(neb_forces(jnp.asarray(geoms),
                                   jnp.asarray(energies),
                                   jnp.asarray(grads), variant="bneb",
                                   optimize_endpoints=True))
    # interior: EXACT cross-code equality of the per-atom projection
    np.testing.assert_allclose(f_ref[1:-1], f_ours[1:-1], atol=1e-12)
    # endpoints: both relax with -g
    np.testing.assert_allclose(f_ref[0], -grads[0], atol=1e-15)
    np.testing.assert_allclose(f_ref[-1], -grads[-1], atol=1e-15)

    # our published-form `lup` (per-IMAGE projection) agrees in direction
    f_lup = np.asarray(neb_forces(jnp.asarray(geoms),
                                  jnp.asarray(energies),
                                  jnp.asarray(grads), variant="lup"))
    for i in range(1, len(geoms) - 1):
        a, b = f_ref[i].ravel(), f_lup[i].ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.4, f"image {i}: cos {cos}"  # same projection family,
        # different granularity (per-atom vs per-image) on random gradients


# ==========================================================================
# OM: exact as-executed reimplementation
# ==========================================================================

def test_om_live_exact_reimplementation():
    mod = _ref_module("multioptpy.MEP.pathopt_om_force")
    par = _ref_module("multioptpy.Parameters.parameter")

    geoms, energies, grads = _band(seed=181)
    elements = ["O", "H", "H"]
    f_ref = _run_ref(mod.CaluculationOM, geoms, energies, grads, elements)

    obj = mod.CaluculationOM()
    k = obj.spring_constant_k
    # locals inside calc_force (pathopt_om_force.py:28-30)
    k_om, dt, damp = 0.001, 1.0, 1.0
    tau = _per_atom_tau(geoms, energies)
    masses = np.array([par.atomic_mass(e) for e in elements])

    expect = [-grads[0]]
    for i in range(1, len(geoms) - 1):
        t = tau[i]
        g = grads[i]
        d_plus = geoms[i + 1] - geoms[i]
        d_minus = geoms[i] - geoms[i - 1]
        l_minus = -(dt / (masses[:, None] * damp)) * grads[i - 1]
        l_0 = -(dt / (masses[:, None] * damp)) * grads[i]
        om_act = k_om * (geoms[i + 1] + geoms[i - 1] - 2 * geoms[i]
                         + l_minus - l_0)
        cos_phi = (np.sum(d_plus * d_minus)
                   / (np.linalg.norm(d_plus) * np.linalg.norm(d_minus)))
        phi = np.arccos(cos_phi)
        f_phi = 0.5 * (1 + np.cos(np.pi * cos_phi)) \
            if 0 <= phi <= np.pi / 2 else 1.0
        perp = g - np.sum(g * t, axis=1, keepdims=True) * t
        spring = (k * np.linalg.norm(d_plus, axis=1, keepdims=True)
                  - k * np.linalg.norm(d_minus, axis=1, keepdims=True)) * t
        om_par = om_act * np.sum(t * t, axis=1, keepdims=True)  # == om_act
        om_perp = f_phi * (om_act
                           - np.sum(om_act * t, axis=1, keepdims=True) * t)
        expect.append(-perp - spring + om_par + om_perp)
    expect.append(-grads[-1])
    np.testing.assert_allclose(f_ref, np.array(expect), atol=1e-12)


# ==========================================================================
# DNEB: broadcast spring + constant 0.5 switch, as executed
# ==========================================================================

def test_dneb_live_exact_reimplementation():
    mod = _ref_module("multioptpy.MEP.pathopt_dneb_force")

    geoms, energies, grads = _band(seed=182)
    f_ref = _run_ref(mod.CaluculationDNEB, geoms, energies, grads)

    obj = mod.CaluculationDNEB()
    k = obj.spring_constant_k
    tau = _per_atom_tau(geoms, energies)

    expect = [-grads[0]]
    for i in range(1, len(geoms) - 1):
        t = tau[i]
        g = grads[i]
        d_plus_n = np.linalg.norm(geoms[i + 1] - geoms[i], axis=1)
        d_minus_n = np.linalg.norm(geoms[i] - geoms[i - 1], axis=1)
        s = k * d_plus_n - k * d_minus_n                    # (N,) scalars
        perp = g - np.sum(g * t, axis=1, keepdims=True) * t
        spring = s[:, None] * t
        # "perpendicular spring": scalar broadcast s*(1 - tau*tau), the
        # executed np.dot(0-d, 1-d) semantics (dneb:118)
        fpp = s[:, None] * (1.0 - t * t)
        # switching factor: |fpp|^2 / |fpp|^2 == 1 -> 2/pi*arctan(1) = 0.5
        sw = 0.5 * (fpp - np.sum(fpp * perp, axis=1, keepdims=True) * perp)
        expect.append(-perp - spring - sw)
    expect.append(-grads[-1])
    np.testing.assert_allclose(f_ref, np.array(expect), atol=1e-12)

    # ours implements the published construction: the dneb extra term is
    # built from the VECTOR spring and the UNIT perpendicular gradient
    from multioptpy_tpu.drivers.neb import neb_forces

    f_ours = np.asarray(neb_forces(jnp.asarray(geoms),
                                   jnp.asarray(energies),
                                   jnp.asarray(grads), variant="dneb"))
    assert np.all(np.isfinite(f_ours))
    assert not np.allclose(f_ours[1:-1], f_ref[1:-1], atol=1e-6)


# ==========================================================================
# NESB: the stale-tau spring bug
# ==========================================================================

def test_nesb_live_stale_tau_spring_bug_pinned():
    """The assembly loop's spring term reads `tau` — the per-atom tangent
    of the LAST interior image, left over from the first tangent loop —
    for EVERY image (nesb:182), while the perpendicular term two lines
    below correctly uses tau_list[i]. Pinned exactly at image 1 (whose
    stiffness force is defined as zero, nesb:135): the executed force is
    -perp(tau_1) - s*tau_LAST, and differs from the correct-tangent form.
    """
    mod = _ref_module("multioptpy.MEP.pathopt_nesb_force")

    geoms, energies, grads = _band(seed=183, n_images=6)
    f_ref = _run_ref(mod.CaluculationNESB, geoms, energies, grads)

    k = mod.CaluculationNESB().spring_constant_k
    t_atom = _per_atom_tau(geoms, energies)
    stale_tau = t_atom[len(geoms) - 2]   # last interior image's tangent

    i = 1
    g = grads[i]
    t_i = t_atom[i]
    perp = g - np.sum(g * t_i, axis=1, keepdims=True) * t_i
    d_plus_n = np.linalg.norm(geoms[i + 1] - geoms[i], axis=1)
    d_minus_n = np.linalg.norm(geoms[i] - geoms[i - 1], axis=1)
    s = (k * d_plus_n - k * d_minus_n)[:, None]
    # as executed: spring along the STALE tangent; stiffness term is zero
    np.testing.assert_allclose(f_ref[i], -perp - s * stale_tau, atol=1e-12)
    # the correct-tangent form does NOT reproduce it
    assert not np.allclose(f_ref[i], -perp - s * t_i, atol=1e-8)

    # endpoints as usual
    np.testing.assert_allclose(f_ref[0], -grads[0], atol=1e-15)
    np.testing.assert_allclose(f_ref[-1], -grads[-1], atol=1e-15)
