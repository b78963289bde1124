"""LIVE parity wave 44: the PES analyzers — calc_irc_curvature,
KoopmanAnalyzer (EDMD), and the PCAPathAnalysis entrypoint executed side
by side with our analysis/pes.py (irc_curvature_properties,
koopman_convergence_analysis, pca_path_analysis).

Conventions learned by execution (ref: PESAnalyzer/*.py):

  * calc_irc_curvature_properties (calc_irc_curvature.py:80) matches our
    irc_curvature_properties to 1e-13: tangent g/|g|, curvature
    (g-g_prev)/ds, coupling = projections onto eigval>1e-8 modes only.
    A zero gradient raises ValueError upstream; ours returns a zero
    tangent (guarded denominator).
  * KoopmanAnalyzer (koopman_analysis.py:85-160) runs EDMD on the LAST
    window_size+1 snapshots with observables [x, x^2, pair distances]
    (poly_degree=2 default): on a linear contraction toward a fixed
    point it recovers the decay multiplier as a Koopman eigenvalue
    (|lambda| ~ 0.8 pinned to 1e-6) together with lambda ~ 1 (the fixed
    point) and lambda ~ 0.64 (the x^2 observable); modes are returned
    as the first 3*natom (identity-observable) rows, column-normalized;
    every call appends coordinates.csv / koopman_eigs.csv /
    koopman_modes.log in file_directory — file side effects inside the
    analysis. append_coordinates REQUIRES flattened length-3N coords
    (ValueError otherwise). Our koopman_convergence_analysis recovers
    the same multiplier from the scalar series via delay embedding.
  * PCAPathAnalysis.main (pca_analysis.py:75-207) glob-discovers
    samples_*_N/*.xyz, then SKIPS THE ALPHABETICALLY FIRST FILE
    (file_list[1:], :78) — the first sampled structure never enters the
    analysis (pinned: a garbage first file leaves the results
    unchanged). The pipeline mass-weights raw file coordinates by
    sqrt(m) (read_xyz_file:23-51), Kabsch-aligns only consecutive PAIRS
    (each structure is stacked as aligned-to-its-predecessor, :87),
    z-scores the stack and eigendecomposes the correlation matrix with
    np.linalg.eig (not eigh, :116) — but then projects the RAW
    (unstandardized) stack onto those eigenvectors for the PC scores
    (:133-134): scores and basis live in different metrics. Energies
    are shifted to energy_list[0] = 0 in __init__. Side effects: 6 pngs
    + 3 logs written into the directory. Our pca_path_analysis
    (analysis/pes.py:35) PCA-decomposes the consistently centered
    trajectory instead.
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

    import matplotlib
    matplotlib.use("Agg")
    return importlib.import_module(name)


def _quiet(fn, *a, **k):
    with contextlib.redirect_stdout(io.StringIO()):
        return fn(*a, **k)


# ==========================================================================
# calc_irc_curvature
# ==========================================================================

def test_irc_curvature_live_matches_ours():
    mod = _ref_module("multioptpy.PESAnalyzer.calc_irc_curvature")
    from multioptpy_tpu.analysis.pes import irc_curvature_properties
    rng = np.random.default_rng(60)
    d = 9
    g = rng.standard_normal(d)
    gp = rng.standard_normal(d)
    a = rng.standard_normal((d, d))
    # PSD + 3 near-zero modes
    h = a @ a.T
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    w = np.array([1e-12, 1e-12, 1e-12, 0.1, 0.3, 0.5, 1.0, 2.0, 3.0])
    h = (q * w) @ q.T
    tan_r, curv_r, sc_r, coup_r = _quiet(
        mod.calc_irc_curvature_properties, g, gp, h, 0.05)
    tan_o, curv_o, sc_o, coup_o = irc_curvature_properties(g, gp, h, 0.05)
    np.testing.assert_allclose(tan_o, tan_r, atol=1e-13)
    np.testing.assert_allclose(curv_o, curv_r, atol=1e-13)
    assert sc_o == pytest.approx(sc_r, rel=1e-13)
    np.testing.assert_allclose(coup_o, coup_r.ravel(), atol=1e-12)
    assert coup_r.shape[0] == 6                # 3 zero modes masked

    with pytest.raises(ValueError):
        mod.calc_unit_tangent_vector(np.zeros(d))
    # ours guards the zero-gradient tangent instead
    t0, _, _, _ = irc_curvature_properties(np.zeros(d), gp, h, 0.05)
    np.testing.assert_allclose(t0, 0.0, atol=0)


# ==========================================================================
# KoopmanAnalyzer
# ==========================================================================

def test_koopman_live_recovers_contraction_multiplier(tmp_path):
    mod = _ref_module("multioptpy.PESAnalyzer.koopman_analysis")
    eng = mod.KoopmanAnalyzer(natom=2, window_size=8, num_frames=2,
                              file_directory=str(tmp_path) + "/")
    rng = np.random.default_rng(61)
    x_star = rng.standard_normal(6)
    v = rng.standard_normal(6)
    lam = 0.8
    for it in range(10):
        coords = x_star + (lam ** it) * v
        _quiet(eng.append_coordinates, it, coords)
    out = _quiet(eng.perform_koopman_analysis)
    assert out is not None
    modes, lambdas = out
    mags = np.sort(np.abs(lambdas))[::-1]
    # fixed point (1), multiplier (0.8), squared observable (0.64)
    assert np.min(np.abs(mags - 1.0)) < 1e-6
    assert np.min(np.abs(mags - lam)) < 1e-6
    assert np.min(np.abs(mags - lam * lam)) < 1e-6
    # identity-part modes: 3*natom rows, unit columns
    assert modes.shape[0] == 6
    for i in range(modes.shape[1]):
        n = np.linalg.norm(modes[:, i])
        assert n < 1e-9 or abs(n - 1.0) < 1e-9
    # file side effects (a koopman_analysis/ subdir is created eagerly
    # in __init__ whenever file_directory is given)
    sub = tmp_path / "koopman_analysis"
    assert (sub / "coordinates.csv").exists()
    assert (sub / "koopman_eigs.csv").exists()
    assert (sub / "koopman_modes.log").exists()

    # shape contract: (N,3) input refused
    with pytest.raises(ValueError):
        _quiet(eng.append_coordinates, 99, np.zeros((2, 3)))

    # ours: delay-embedded DMD on the scalar distance-to-fixed-point
    # series finds the same multiplier
    from multioptpy_tpu.analysis.pes import koopman_convergence_analysis
    series = [np.linalg.norm((lam ** it) * v) for it in range(12)]
    res = koopman_convergence_analysis(series)
    assert res.converging
    assert np.min(np.abs(np.abs(res.eigenvalues) - lam)) < 1e-6


# ==========================================================================
# PCAPathAnalysis
# ==========================================================================

def _write_xyz(path, coords):
    elems = ["O", "H", "H"]
    with open(path, "w") as f:
        f.write("3\ncomment line\n")
        for el, row in zip(elems, coords):
            f.write(f"{el} {row[0]:.10f} {row[1]:.10f} {row[2]:.10f}\n")


def _pca_mirror(files, ref_pkg):
    ct = ref_pkg["calc_tools"].Calculationtools()
    am = ref_pkg["parameter"].atomic_mass
    elems = ["O", "H", "H"]

    def read(p):
        out = []
        with open(p) as f:
            for line in f.read().splitlines():
                w = line.split()
                if len(w) != 4:
                    continue
                out.append(np.sqrt(am(w[0]))
                           * np.array(w[1:4], dtype=np.float64))
        return np.array(out)

    stack = None
    n = len(files)
    for i in range(n - 1):
        c1, c2 = read(files[i]), read(files[i + 1])
        m1, m2 = ct.kabsch_algorithm(c1, c2)
        r1 = m1.reshape(1, -1)
        r2 = m2.reshape(1, -1)
        if i == 0:
            stack = r1.copy()
        stack = np.vstack([stack, r2])
    mean = stack.mean(axis=0)
    std = stack.std(axis=0)
    z = (stack - mean) / std
    cov = (z.T @ z) / (n - 1)
    w, _ = np.linalg.eig(cov)
    w = np.real_if_close(w, tol=1000)
    contrib = w / w.sum()
    order = np.argsort(w)
    del elems
    return np.array([contrib[order[-1]], contrib[order[-2]],
                     contrib[order[-3]]], dtype=np.float64)


def test_pca_live_skips_first_file_and_writes_artifacts(tmp_path):
    mod = _ref_module("multioptpy.PESAnalyzer.pca_analysis")
    ref_pkg = {
        "calc_tools": _ref_module("multioptpy.Utils.calc_tools"),
        "parameter": _ref_module("multioptpy.Parameters.parameter"),
    }
    rng = np.random.default_rng(62)
    base = np.array([[0.0, 0.0, 0.1], [0.76, 0.0, -0.47],
                     [-0.76, 0.0, -0.47]])
    files = []
    for i in range(7):
        d = tmp_path / f"samples_job_{i}"
        d.mkdir()
        p = d / "struct.xyz"
        if i == 0:
            # garbage outlier — must NOT affect the analysis
            _write_xyz(p, 1e3 * rng.standard_normal((3, 3)))
        else:
            bend = base.copy()
            bend[1, 0] += 0.08 * i
            bend[2, 2] -= 0.05 * i
            bend += 0.01 * rng.standard_normal((3, 3))
            _write_xyz(p, bend)
        files.append(str(p))

    n_used = 6                                 # 7 files, first skipped
    energies = list(np.linspace(0.0, 0.01, n_used))
    eng = mod.PCAPathAnalysis(str(tmp_path) + "/", energies, energies)
    # __init__ shifts energies to zero at the first point
    assert eng.energy_list[0] == 0.0
    _quiet(eng.main)

    for name in ("pca_analysis_result.log",
                 "pca_analysis_result_redundant.log",
                 "pca_analysis_result_z_matrix.log",
                 "pca_result_visualization_energy.png",
                 "pca_result_visualization_redundant_energy.png",
                 "pca_result_visualization_z_matrix_energy.png"):
        assert (tmp_path / name).exists(), name

    # parse the top-3 cartesian contributions from the log and compare
    # to the mirror computed WITHOUT the garbage first file
    text = (tmp_path / "pca_analysis_result.log").read_text()
    got = [float(line.split("contribution: ")[1])
           for line in text.splitlines()
           if line.startswith("contribution: ")][:3]
    want = _pca_mirror(files[1:], ref_pkg)
    np.testing.assert_allclose(got, want, rtol=1e-8)
