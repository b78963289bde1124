"""LIVE parity wave 53: the energy-aware redistribution family —
distribute_geometry_by_energy, predict_hidden_ts_weights, and the
spline climbing-image replacement — executed side by side with our
interpolation.py (adaptive_resample / bernstein_energy_resample) and
drivers/neb.py spline_ci.

Conventions learned by execution (ref: Interpolation/
linear_interpolation.py:338-473, adaptive_interpolation.py:46-125,
Utils/calc_tools.py:865-883):

  * distribute_geometry_by_energy builds node weights 0.5 w_height +
    0.5 w_convexity + smoothing and respaces by INVERSE CDF over the
    weight-scaled arc: high-weight (peak) regions collect more nodes,
    i.e. smaller physical spacing at the energy maximum
    (mirror-pinned to 1e-12 on a COM-fixed band + behavioral pin).
    Flat energy profiles degenerate to the uniform smoothing weight.
  * predict_hidden_ts_weights fits a cubic Hermite per segment from
    energies + TANGENT-PROJECTED GRADIENTS and boosts both segment ends
    by +2.0 when a strictly interior concave-down stationary point
    exists. The sign convention matters exactly as its docstring warns:
    feeding FORCES (flipped gradients) turns the hidden maximum into a
    hidden minimum and the boost silently vanishes (pinned). Equal
    endpoint energies with equal nonzero slopes are boosted too — the
    Hermite cubic then necessarily carries an interior max+min pair.
  * apply_climbing_image MUTATES ITS INPUT: the left node of the
    segment containing each spline energy maximum is overwritten
    in place with an IDPP-refined interpolation; the scan runs
    range(2, n-2) (calc_tools.py:875), so maxima in the first two or
    last two segments can never be refined (the pinned change indices
    always lie in [2, n-3]).
  * THE SPLINE EXTREMUM FINDER HALLUCINATES ON MONOTONIC DATA
    (interpolation.py:111-146): Newton iteration from each segment
    midpoint bails out immediately when |S''| < 1e-12 and RETURNS THE
    MIDPOINT as the "root"; on a (numerically) linear energy profile
    every segment midpoint is reported as an extremum, classified as
    maximum or minimum by the SIGN OF FLOATING-POINT NOISE in the
    spline's second derivative (pinned: maxima+minima = n-1 segments,
    each at its midpoint) — apply_climbing_image then "climbs" noise
    maxima of a barrier-free monotonic path and rewrites interior
    nodes. Our spline_ci (drivers/neb.py spline_ci_start) locates
    maxima on the dense spline samples instead.
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


def _stretch_band(n_img, d_max=2.0):
    """2-atom bond-stretch band: COM-fixed so the centered arc metric
    equals the raw one."""
    ds = np.linspace(0.5, d_max, n_img)
    return [np.array([[-d / 2, 0.0, 0.0], [d / 2, 0.0, 0.0]])
            for d in ds]


# ==========================================================================
# distribute_geometry_by_energy
# ==========================================================================

def test_by_energy_live_mirror_and_peak_concentration():
    mod = _ref_module("multioptpy.Interpolation.linear_interpolation")
    ct = _ref_module("multioptpy.Utils.calc_tools")
    n = 9
    band = _stretch_band(n)
    e = np.exp(-((np.arange(n) - 4.0) / 1.5) ** 2)  # peak at image 4
    got = _quiet(mod.distribute_geometry_by_energy, band, list(e),
                 None, None, 0.1)
    got = np.array(got)

    # mirror: weights -> inverse CDF over the weighted arc
    plen = np.array(ct.calc_path_length_list(band))
    w_g = (e - e.min()) / (e.max() - e.min())
    w_l = np.zeros_like(e)
    conv = e[1:-1] - (e[:-2] + e[2:]) / 2.0
    w_l[1:-1] = np.maximum(conv, 0.0)
    w_l /= w_l.max()
    w_l[0] = w_l[1]
    w_l[-1] = w_l[-2]
    w = 0.5 * w_g + 0.5 * w_l + 0.1
    seg = np.diff(plen) * (w[:-1] + w[1:]) / 2.0
    cumw = np.concatenate([[0.0], np.cumsum(seg)])
    grid = np.linspace(0, cumw[-1], n)
    targets = np.interp(grid, cumw, plen)
    want = []
    arr = np.array(band)
    for dist in targets:
        if dist <= 0:
            want.append(arr[0])
            continue
        if dist >= plen[-1]:
            want.append(arr[-1])
            continue
        j = np.searchsorted(plen, dist, side="right") - 1
        t = (dist - plen[j]) / (plen[j + 1] - plen[j])
        want.append(arr[j] + t * (arr[j + 1] - arr[j]))
    np.testing.assert_allclose(got, np.array(want), atol=1e-12)

    # concentration: spacing is smallest near the energy peak
    # (bond length is the arc coordinate here)
    bond = got[:, 1, 0] - got[:, 0, 0]
    gaps = np.diff(bond)
    peak_bond = band[4][1, 0] - band[4][0, 0]
    mid = np.argmin(np.abs((bond[:-1] + bond[1:]) / 2 - peak_bond))
    assert gaps[mid] < gaps[0]
    assert gaps[mid] < gaps[-1]


def test_by_energy_live_flat_profile_uniform():
    mod = _ref_module("multioptpy.Interpolation.linear_interpolation")
    band = _stretch_band(7)
    got = np.array(_quiet(mod.distribute_geometry_by_energy, band,
                          [1.0] * 7, None, None, 0.1))
    bond = got[:, 1, 0] - got[:, 0, 0]
    gaps = np.diff(bond)
    np.testing.assert_allclose(gaps, gaps[0], rtol=1e-8)


# ==========================================================================
# predict_hidden_ts_weights
# ==========================================================================

def test_hidden_ts_live_boost_and_force_sign_trap():
    mod = _ref_module("multioptpy.Interpolation.adaptive_interpolation")
    # 1D two-node segment along x with equal energies and slopes
    # +1 at the left node, -1 at the right: a hidden interior maximum
    geoms = [np.array([[0.0, 0.0, 0.0]]), np.array([[1.0, 0.0, 0.0]])]
    energies = [0.0, 0.0]
    grads_up = [np.array([[1.0, 0.0, 0.0]]),
                np.array([[-1.0, 0.0, 0.0]])]
    w = mod.predict_hidden_ts_weights(geoms, energies, grads_up)
    np.testing.assert_allclose(w, [2.0, 2.0], atol=0)

    # a genuinely linear segment (consistent energies and slopes):
    # no stationary point, no boost. NOTE equal-energy endpoints with
    # equal NONZERO slopes are NOT monotonic under the Hermite fit —
    # they force an interior max+min pair and do get boosted.
    w2 = mod.predict_hidden_ts_weights(
        geoms, [0.0, 1.0],
        [np.array([[1.0, 0.0, 0.0]]), np.array([[1.0, 0.0, 0.0]])])
    np.testing.assert_allclose(w2, 0.0, atol=0)
    w2b = mod.predict_hidden_ts_weights(
        geoms, [0.0, 0.0],
        [np.array([[1.0, 0.0, 0.0]]), np.array([[1.0, 0.0, 0.0]])])
    np.testing.assert_allclose(w2b, [2.0, 2.0], atol=0)

    # FORCES instead of gradients flip the maximum into a minimum:
    # the hidden TS silently disappears (the docstring's warning,
    # pinned by execution)
    forces = [-g for g in grads_up]
    w3 = mod.predict_hidden_ts_weights(geoms, energies, forces)
    np.testing.assert_allclose(w3, 0.0, atol=0)


# ==========================================================================
# apply_climbing_image
# ==========================================================================

def test_apply_climbing_image_live_mutates_input_and_skips_edges():
    ct = _ref_module("multioptpy.Utils.calc_tools")
    n = 9
    band = _stretch_band(n)
    originals = [g.copy() for g in band]
    # smooth energy maximum midway between images 4 and 5
    s = np.arange(n, dtype=float)
    e = list(np.exp(-((s - 4.5) / 1.2) ** 2))
    out = _quiet(ct.apply_climbing_image, band, e, ["H", "H"])
    assert out is band                         # same list object
    changed = [i for i in range(n)
               if not np.allclose(band[i], originals[i])]
    # exactly one interior LEFT node of the containing segment moved,
    # and it lies in the allowed window range(2, n-2)
    assert len(changed) == 1
    assert 2 <= changed[0] < n - 2

    # the extremum finder hallucinates on a monotonic profile: every
    # segment midpoint comes back as an "extremum" (Newton bails out
    # at |S''| < 1e-12 and returns its starting midpoint), max-vs-min
    # decided by floating-point noise
    interp = _ref_module("multioptpy.Interpolation.interpolation")
    band2 = _stretch_band(n)
    plen = np.array(ct.calc_path_length_list(band2))
    e2 = list(np.linspace(1.0, 0.0, n))
    mx, mn = _quiet(interp.spline_interpolation, list(plen), e2)
    assert len(mx) + len(mn) == n - 1          # one per segment
    mids = (plen[:-1] + plen[1:]) / 2.0
    for root, _val in mx + mn:
        assert np.min(np.abs(mids - root)) < 1e-9
    # consequence: climbing images get inserted on a barrier-free path
    originals2 = [g.copy() for g in band2]
    _quiet(ct.apply_climbing_image, band2, e2, ["H", "H"])
    changed2 = [i for i in range(n)
                if not np.allclose(band2[i], originals2[i])]
    assert changed2                            # monotonic path mutated
    assert all(2 <= i < n - 2 for i in changed2)

    # ours solves the per-segment quadratic analytically and requires
    # the root INSIDE the segment: a monotonic profile is untouched
    from multioptpy_tpu.drivers.neb import spline_climbing_insert
    import jax.numpy as jnp
    path = jnp.asarray(np.array(originals2))
    out_ours = spline_climbing_insert(path, np.linspace(1.0, 0.0, n))
    np.testing.assert_allclose(np.asarray(out_ours),
                               np.array(originals2), atol=1e-12)
