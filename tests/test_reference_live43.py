"""LIVE parity wave 43: the interpolation library — the reference's
linear / spline / Savitzky-Golay / Bernstein path redistribution
executed side by side with our interpolation.py (linear_resample,
cubic_spline_resample, savitzky_golay_smooth, bernstein_resample).

Conventions learned by execution (ref: Interpolation/*.py):

  * the shared arc-length metric (Utils/calc_tools.py:853
    calc_path_length_list) CENTERS every image at its coordinate mean
    before differencing: rigid translations contribute ZERO path length.
    A band of pure translations has total_length < 1e-8 and
    distribute_geometry_by_length collapses it to a single image
    (pinned); bands with COM drift are respaced by a parameterization
    (centered) inconsistent with the geometries interpolated (raw). Our
    linear_resample uses the raw Cartesian arc length — it matches the
    reference exactly on COM-fixed bands (1e-12 below) and deliberately
    differs on drifting ones.
  * distribute_geometry (linear_interpolation.py:308) = equal-arc-length
    piecewise-linear respacing with preserved endpoints.
  * distribute_geometry_by_length (:274) DROPS THE TRUE ENDPOINT when
    the last spacing sample lands within 1e-4 of it (:302 appends
    geometry[-1] only if the previous point is farther than 1e-4): the
    returned path can end slightly short of the final structure. Our
    resamplers always pin both endpoints exactly.
  * spline_interpolation (spline_interpolation.py:7) parameterizes ALL
    methods by IMAGE INDEX (x = linspace over the structure count, :44),
    not arc length: evaluating at n_points = n_structures returns the
    input band bit-for-bit, crowding preserved. Our
    cubic_spline_resample parameterizes by normalized arc length, so the
    same call EQUALIZES segment lengths (pinned on a crowded collinear
    band).
  * savitzky_golay_interpolation (savitzky_golay_interpolation.py:7-53)
    SCRAMBLES ITS OUTPUT: it builds per-(atom,coord) tracks as ROWS of
    a (3 n_atoms, n_points) array and then reshapes straight to
    (n_points, n_atoms, 3) WITHOUT the required transpose (:50-52) —
    element [0] of the result interleaves different atoms' coordinate
    tracks at different path times (mirror-pinned; the N < window
    linear fallback at :25-33 has the same bug). The smoothed endpoints
    also drift off the input endpoints (savgol_filter's polynomial edge
    treatment). Our savitzky_golay_smooth filters along axis 0 with the
    layout intact and re-pins both endpoints.
  * bernstein_interpolation (binomial_interpolation.py:7) is an
    (N-1)-degree Bezier with the images as control points, evaluated at
    UNIFORM t — matches our bernstein_resample to 1e-8. Its "by length"
    variant (:25) maps requested arc distances to t LINEARLY
    (t = dist/total, :42): Bezier t is not arc length, so the actual
    spacing between returned points deviates from angstrom_spacing by
    tens of percent on a curved path (measured ~±40% below) — the
    function name promises a property the math does not deliver.
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


def _curved_band(n_img=7, n_atom=2):
    t = np.linspace(0.0, 1.0, n_img)
    band = np.zeros((n_img, n_atom, 3))
    band[:, 0, 0] = np.cos(np.pi * t)
    band[:, 0, 1] = np.sin(np.pi * t)
    band[:, 1, 0] = 2.0 + t
    band[:, 1, 2] = t * t
    return band


# ==========================================================================
# linear
# ==========================================================================

def _com_fixed_band(n_img=6):
    """Two atoms mirrored about the origin: COM identically zero."""
    t = np.linspace(0.0, 1.0, n_img)
    band = np.zeros((n_img, 2, 3))
    p = np.stack([np.cos(np.pi * t), np.sin(np.pi * t), t * t], axis=1)
    band[:, 0, :] = p
    band[:, 1, :] = -p
    return band


def test_linear_distribute_geometry_matches_our_linear_resample():
    mod = _ref_module("multioptpy.Interpolation.linear_interpolation")
    from multioptpy_tpu.interpolation import linear_resample
    import jax.numpy as jnp
    band = _com_fixed_band(6)
    got = np.array(_quiet(mod.distribute_geometry, list(band)))
    ours = np.asarray(linear_resample(jnp.asarray(band), 6))
    np.testing.assert_allclose(got, ours, atol=1e-12)
    # endpoints preserved on both sides
    np.testing.assert_allclose(got[0], band[0], atol=0)
    np.testing.assert_allclose(got[-1], band[-1], atol=0)


def test_linear_translation_band_has_zero_path_length():
    mod = _ref_module("multioptpy.Interpolation.linear_interpolation")
    # the molecule rigidly translates 5 Bohr: centered metric sees 0
    shift = np.array([5.0, 0.0, 0.0])
    mol = np.array([[0.0, 0.0, 0.0], [1.0, 0.5, 0.0]])
    band = [mol, mol + 0.5 * shift, mol + shift]
    out = _quiet(mod.distribute_geometry_by_length, band, 0.3)
    assert len(out) == 1                       # collapsed to one image
    np.testing.assert_allclose(out[0], mol, atol=0)


def test_linear_distribute_by_length_drops_near_endpoint():
    mod = _ref_module("multioptpy.Interpolation.linear_interpolation")
    # a 2-atom bond stretching 0 -> sqrt(2): centered arc length 1.0;
    # spacing 0.24999 puts the 4th sample at 0.99996 — within 1e-4 of
    # the endpoint, which is then NOT appended
    def img(d):
        return np.array([[-d / 2, 0.0, 0.0], [d / 2, 0.0, 0.0]])

    dmax = np.sqrt(2.0)
    band = [img(0.0), img(dmax / 2), img(dmax)]
    out = _quiet(mod.distribute_geometry_by_length, band, 0.24999)
    last = out[-1]
    # the last returned image is the interpolated point at arc 0.99996,
    # a hair short of the final structure, and the endpoint is dropped
    assert not np.allclose(last, band[-1])
    assert np.linalg.norm(last - band[-1]) < 1e-4
    # a spacing that leaves a visible gap keeps the endpoint
    out2 = _quiet(mod.distribute_geometry_by_length, band, 0.3)
    np.testing.assert_allclose(out2[-1], band[-1], atol=0)


# ==========================================================================
# spline
# ==========================================================================

def test_spline_live_parameterizes_by_index_not_arc_length():
    mod = _ref_module("multioptpy.Interpolation.spline_interpolation")
    from multioptpy_tpu.interpolation import cubic_spline_resample
    import jax.numpy as jnp
    # crowded collinear band: 3 images within 0.2 Bohr, one 2.8 away
    band = np.zeros((4, 1, 3))
    band[:, 0, 0] = [0.0, 0.1, 0.2, 3.0]
    got = _quiet(mod.spline_interpolation, list(band), n_points=4,
                 method="cubic", bc_type="natural")
    # index parameterization: evaluating at the node grid returns the
    # input band exactly — crowding preserved
    np.testing.assert_allclose(got, band, atol=1e-10)
    # ours equalizes arc length: segments all ~1.0
    ours = np.asarray(cubic_spline_resample(jnp.asarray(band), 4))
    segs = np.linalg.norm(np.diff(ours[:, 0, 0]))
    seg_lengths = np.diff(ours[:, 0, 0])
    assert np.all(np.abs(seg_lengths - 1.0) < 0.35), seg_lengths
    del segs


def test_spline_live_methods_dispatch_and_unknown_raises():
    mod = _ref_module("multioptpy.Interpolation.spline_interpolation")
    band = _curved_band(6)
    for method in ("linear", "quadratic", "cubic", "b-spline",
                   "hermite"):
        out = _quiet(mod.spline_interpolation, list(band), n_points=9,
                     method=method, spline_degree=3)
        assert out.shape == (9, 2, 3)
        np.testing.assert_allclose(out[0], band[0], atol=1e-10)
    with pytest.raises(ValueError):
        _quiet(mod.spline_interpolation, list(band), n_points=9,
               method="nope")


# ==========================================================================
# Savitzky-Golay
# ==========================================================================

def test_savgol_live_output_is_scrambled_by_missing_transpose():
    mod = _ref_module(
        "multioptpy.Interpolation.savitzky_golay_interpolation")
    from scipy.interpolate import interp1d
    from scipy.signal import savgol_filter
    band = _curved_band(7, 2)
    n_points = 5
    got = _quiet(mod.savitzky_golay_interpolation, list(band),
                 n_points=n_points, window_length=5, polyorder=2)

    # exact mirror INCLUDING the missing transpose
    sm = np.zeros_like(band)
    for a in range(2):
        for c in range(3):
            sm[:, a, c] = savgol_filter(band[:, a, c], 5, 2)
    t0 = np.linspace(0, 1, 7)
    ti = np.linspace(0, 1, n_points)
    rows = []
    for a in range(2):
        for c in range(3):
            rows.append(interp1d(t0, sm[:, a, c], kind="linear")(ti))
    scrambled = np.array(rows).reshape(n_points, 2, 3)
    np.testing.assert_allclose(got, scrambled, atol=1e-12)

    # the CORRECT layout differs: the bug is real, not a no-op
    correct = np.array(rows).T.reshape(n_points, 2, 3)
    assert not np.allclose(got, correct)

    # ours keeps the layout and pins the endpoints
    from multioptpy_tpu.interpolation import savitzky_golay_smooth
    import jax.numpy as jnp
    ours = np.asarray(savitzky_golay_smooth(jnp.asarray(band),
                                            window=5, order=2))
    np.testing.assert_allclose(ours[0], band[0], atol=0)
    np.testing.assert_allclose(ours[-1], band[-1], atol=0)
    for a in range(2):
        for c in range(3):
            np.testing.assert_allclose(ours[1:-1, a, c],
                                       sm[1:-1, a, c], atol=1e-12)


# ==========================================================================
# Bernstein
# ==========================================================================

def test_bernstein_live_matches_ours_at_uniform_t():
    mod = _ref_module("multioptpy.Interpolation.binomial_interpolation")
    from multioptpy_tpu.interpolation import bernstein_resample
    import jax.numpy as jnp
    band = _curved_band(6)
    got = _quiet(mod.bernstein_interpolation, list(band), n_points=9)
    ours = np.asarray(bernstein_resample(jnp.asarray(band), 9))
    np.testing.assert_allclose(got, ours, atol=1e-7)
    np.testing.assert_allclose(got[0], band[0], atol=1e-12)
    np.testing.assert_allclose(got[-1], band[-1], atol=1e-12)


def test_bernstein_by_length_spacing_is_not_arc_length():
    mod = _ref_module("multioptpy.Interpolation.binomial_interpolation")
    # a strongly curved single-atom path
    t = np.linspace(0, 1, 8)
    band = np.zeros((8, 1, 3))
    band[:, 0, 0] = np.cos(2.5 * t)
    band[:, 0, 1] = np.sin(2.5 * t)
    spacing = 0.4
    out = np.array(_quiet(mod.distribute_geometry_by_length_bernstein,
                          list(band), spacing))
    gaps = np.linalg.norm(np.diff(out[:, 0, :], axis=0), axis=1)
    # requested 0.4 spacing; Bezier-t mapping misses it badly
    rel_err = np.abs(gaps - spacing) / spacing
    assert rel_err.max() > 0.10, gaps
