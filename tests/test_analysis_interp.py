"""Interpolation, PES analyzers, symmetry, visualization."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.analysis.pes import (
    cmds_path_analysis,
    irc_curvature,
    koopman_convergence_analysis,
    pca_path_analysis,
)
from multioptpy_tpu.analysis.symmetry import analyze_symmetry
from multioptpy_tpu.interpolation import (
    bernstein_resample,
    cubic_spline_resample,
    geodesic_resample,
    linear_resample,
)
from multioptpy_tpu.units import ANGSTROM2BOHR


@pytest.fixture
def zigzag_path(rng):
    # 6-image path of a 3-atom system
    base = jnp.asarray(rng.normal(size=(3, 3)) * 2.0)
    return jnp.stack([base + i * 0.3 + 0.05 * ((-1) ** i) for i in range(6)])


class TestInterpolation:
    @pytest.mark.parametrize("fn", [linear_resample, cubic_spline_resample,
                                    bernstein_resample])
    def test_endpoints_and_shape(self, zigzag_path, fn):
        out = fn(zigzag_path, 11)
        assert out.shape == (11, 3, 3)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(zigzag_path[0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out[-1]),
                                   np.asarray(zigzag_path[-1]), atol=1e-8)

    def test_linear_resample_even_spacing(self, zigzag_path):
        out = linear_resample(zigzag_path, 9)
        seg = np.linalg.norm(
            np.diff(np.asarray(out).reshape(9, -1), axis=0), axis=1)
        assert seg.std() / seg.mean() < 0.05

    def test_geodesic_runs(self, zigzag_path):
        out = geodesic_resample(zigzag_path, 8, z=np.array([6, 6, 6]),
                                n_iter=20)
        assert out.shape == (8, 3, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestPESAnalyzers:
    def test_cmds_and_pca(self, zigzag_path):
        emb = cmds_path_analysis(np.asarray(zigzag_path))
        assert emb.coords_2d.shape == (6, 2)
        emb2 = pca_path_analysis(np.asarray(zigzag_path))
        assert emb2.coords_2d.shape == (6, 2)
        assert emb2.explained[0] > 0.5  # path is mostly 1-D drift

    def test_koopman_decaying_series(self):
        series = 1e-2 * 0.8 ** np.arange(40)
        res = koopman_convergence_analysis(series)
        assert res.converging

    def test_irc_curvature_straight_vs_bent(self):
        straight = np.stack([np.full((2, 3), i * 0.1) for i in range(8)])
        c = irc_curvature(straight)
        np.testing.assert_allclose(c, 0.0, atol=1e-8)


class TestSymmetry:
    def test_water_c2v(self):
        coords = np.array([[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
                           [0.0, -0.7572, -0.4692]]) * ANGSTROM2BOHR
        res = analyze_symmetry(coords, np.array([8, 1, 1]))
        assert res.point_group == "C2v"
        assert res.symmetry_number == 2

    def test_co2_dinfh(self):
        coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.2],
                           [0.0, 0.0, -2.2]])
        res = analyze_symmetry(coords, np.array([6, 8, 8]))
        assert res.point_group == "D*h"
        assert res.is_linear

    def test_hcn_cinfv(self):
        coords = np.array([[0.0, 0.0, -2.0], [0.0, 0.0, 0.0],
                           [0.0, 0.0, 2.2]])
        res = analyze_symmetry(coords, np.array([1, 6, 7]))
        assert res.point_group == "C*v"

    def test_methane_td(self):
        a = 1.19
        coords = np.array([[0.0, 0.0, 0.0], [a, a, a], [a, -a, -a],
                           [-a, a, -a], [-a, -a, a]])
        res = analyze_symmetry(coords, np.array([6, 1, 1, 1, 1]))
        assert res.point_group in ("Td", "D3", "D3d")  # Td expected
        assert res.symmetry_number >= 6

    def test_chiral_c1(self, rng):
        coords = rng.normal(size=(5, 3)) * 2.0
        res = analyze_symmetry(coords, np.array([6, 1, 7, 8, 9]))
        assert res.point_group == "C1"
        assert res.symmetry_number == 1


def test_visualization_writes_files(tmp_path, zigzag_path):
    from multioptpy_tpu.analysis.visualization import (
        plot_energy_profile, plot_neb_band, plot_reaction_profile)

    e = np.linspace(-1.0, -1.2, 10)
    p1 = plot_energy_profile(e, str(tmp_path / "e.png"),
                             csv_path=str(tmp_path / "e.csv"))
    hist = np.stack([np.linspace(0, 0.01 * i, 8) for i in range(4)])
    p2 = plot_neb_band(hist, str(tmp_path / "band.png"))
    p3 = plot_reaction_profile([-1.0, -0.95, -1.05], ["R", "TS", "P"],
                               str(tmp_path / "prof.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 1000
