"""LIVE parity wave 48: OptMESX (v1) vs OptMESX2 vs our mesx2 model
function, the NRO (natural reaction orbital) analyzer with a mock SP
backend, and the Visualization module's artifact surface.

Conventions learned by execution (ref: ModelFunction/opt_mesx.py,
opt_mesx_2.py, WFAnalyzer/MO_analysis.py, Visualization/
visualization.py):

  * OptMESX AND OptMESX2 ARE NUMERICALLY IDENTICAL TODAY: opt_mesx_2's
    docstring says it "replaces the arbitrary '140' factor with the
    analytical gap force 2(E1-E2)" — but opt_mesx.py:41 now contains
    the SAME 2(E1-E2) factor; calc_energy/calc_grad/calc_hess agree to
    machine precision on shared inputs (pinned). The historical
    distinction the file names suggest no longer exists; our single
    mesx2 kind (calculators/two_state.py:89-114) covers both and
    matches the executed reference to 1e-12.
  * The GP gradient is NOT the gradient of any scalar: the gap force
    2(E1-E2) v uses the NORMALIZED difference-gradient direction
    (Bearpark-style), so it scales linearly in the gap while the seam
    force lives in the orthogonal complement; the tracked objective is
    the plain mean energy.
  * NROAnalysis.run (MO_analysis.py:62-104) builds the first response
    matrix C0^T S (dC/ds) by central differences ALONG THE CURRENT MOVE
    DIRECTION (delta = 1e-4 * move/|move|), SVDs it, and logs the SUM
    of singular values; the SP object's attributes are read back after
    each displaced single_point_no_directory call (a stateful
    side-effect API — the mock below reproduces it); three CSVs are
    appended under file_directory. For an analytically rotating orbital
    basis C(s) = R(theta s) C0 with S = I, the singular-value sum
    equals the rotation rate |theta| * |C column pair| (pinned to
    1e-6 against the analytic value).
  * Visualization.Graph / NEBVisualizer (visualization.py:6-145) write
    matplotlib pngs into the run folder; plot_energy names files
    {folder}/energy_plot_{iter}.png etc. — executed headless (Agg) and
    pinned by artifact existence.
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
# OptMESX v1 == v2 == our mesx2
# ==========================================================================

def test_opt_mesx_live_v1_equals_v2():
    m1 = _ref_module("multioptpy.ModelFunction.opt_mesx").OptMESX()
    m2 = _ref_module("multioptpy.ModelFunction.opt_mesx_2").OptMESX2()
    rng = np.random.default_rng(90)
    n = 3
    e1, e2 = -5.0, -4.97
    g1 = rng.standard_normal((n, 3))
    g2 = rng.standard_normal((n, 3))
    h1 = rng.standard_normal((3 * n, 3 * n))
    h1 = h1 + h1.T
    h2 = rng.standard_normal((3 * n, 3 * n))
    h2 = h2 + h2.T

    assert _quiet(m1.calc_energy, e1, e2) == _quiet(m2.calc_energy,
                                                    e1, e2)
    gg1 = _quiet(m1.calc_grad, e1, e2, g1, g2)
    gg2 = _quiet(m2.calc_grad, e1, e2, g1, g2)
    np.testing.assert_allclose(gg1, gg2, atol=1e-15)
    hh1 = m1.calc_hess(g1, g2, h1, h2)
    hh2 = m2.calc_hess(g1, g2, h1, h2)
    np.testing.assert_allclose(hh1, hh2, atol=1e-15)


class _StubCalc:
    """Quadratic two-state stub with the Calculator duck-type surface."""

    on_device = False

    def __init__(self, center, offset, k=1.0):
        self.center = np.asarray(center, float)
        self.offset = float(offset)
        self.k = k

    def energy(self, coords, z):
        d = np.asarray(coords, float) - self.center
        return self.offset + 0.5 * self.k * np.sum(d * d)

    def energy_and_gradient(self, coords, z):
        d = np.asarray(coords, float) - self.center
        return self.energy(coords, z), self.k * d

    def gradient(self, coords, z):
        return self.energy_and_gradient(coords, z)[1]

    def hessian(self, coords, z):
        n = np.asarray(coords).size
        return self.k * np.eye(n)


def test_opt_mesx_live_matches_our_mesx2():
    ref = _ref_module("multioptpy.ModelFunction.opt_mesx").OptMESX()
    from multioptpy_tpu.calculators.two_state import TwoStateModelFunction
    import jax.numpy as jnp
    rng = np.random.default_rng(91)
    n = 2
    coords = rng.standard_normal((n, 3))
    z = np.array([1, 1])
    c1 = _StubCalc(rng.standard_normal((n, 3)), -5.0)
    c2 = _StubCalc(rng.standard_normal((n, 3)), -4.9, k=1.3)
    mf = TwoStateModelFunction(c1, c2, kind="mesx2")
    e_ours, g_ours = mf.energy_and_gradient(jnp.asarray(coords), z)

    e1, g1 = c1.energy_and_gradient(coords, z)
    e2, g2 = c2.energy_and_gradient(coords, z)
    e_ref = _quiet(ref.calc_energy, e1, e2)
    g_ref = _quiet(ref.calc_grad, e1, e2, g1, g2)
    assert float(e_ours) == pytest.approx(e_ref, rel=1e-12)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref, atol=1e-12)

    h_ours = np.asarray(mf.hessian(jnp.asarray(coords), z))
    h_ref = ref.calc_hess(g1.reshape(-1), g2.reshape(-1),
                          c1.hessian(coords, z), c2.hessian(coords, z))
    np.testing.assert_allclose(h_ours, h_ref, atol=1e-12)


def test_opt_mesx_live_gap_force_uses_normalized_direction():
    """Doubling both gradients leaves the gap force unchanged (v is
    normalized) while the seam force doubles — the GP vector is not a
    plain chain-rule gradient."""
    ref = _ref_module("multioptpy.ModelFunction.opt_mesx").OptMESX()
    rng = np.random.default_rng(92)
    g1 = rng.standard_normal((2, 3))
    g2 = rng.standard_normal((2, 3))
    e1, e2 = 1.0, 0.9
    a = _quiet(ref.calc_grad, e1, e2, g1, g2).ravel()
    b = _quiet(ref.calc_grad, e1, e2, 2 * g1, 2 * g2).ravel()
    dg = (g1 - g2).ravel()
    v = dg / np.linalg.norm(dg)
    gap = 2.0 * (e1 - e2) * v
    seam_a = a - gap
    seam_b = b - gap
    np.testing.assert_allclose(seam_b, 2.0 * seam_a, atol=1e-12)


# ==========================================================================
# NROAnalysis
# ==========================================================================

class _MockSP:
    """Stateful SP mock: orbitals rotate with displacement along x of
    atom 0; the analyzer reads attributes AFTER each call."""

    def __init__(self, theta=0.3):
        self.theta = theta
        self.overlap_matrix = np.eye(2)
        self._set(0.0)

    def _rot(self, a):
        return np.array([[np.cos(a), -np.sin(a)],
                         [np.sin(a), np.cos(a)]])

    def _set(self, s):
        self.orbital_coefficients = self._rot(self.theta * s)
        self.orbital_energies = np.array([-0.5 + 0.1 * s,
                                          0.2 + 0.05 * s * s])

    def single_point_no_directory(self, geom, elements, chmult, method):
        s = float(geom[0, 0])                  # displacement coordinate
        self._set(s)
        return None, None, None


def test_nro_live_lambda_sum_matches_analytic_rotation(tmp_path):
    mod = _ref_module("multioptpy.WFAnalyzer.MO_analysis")
    eng = mod.NROAnalysis(xtb="gfn2", element_list=["H", "H"],
                          electric_charge_and_multiplicity=[0, 1],
                          file_directory=str(tmp_path) + "/")
    sp = _MockSP(theta=0.3)
    geom = np.zeros((2, 3))
    move = np.zeros((2, 3))
    move[0, 0] = 1.0                           # displace along +x atom 0
    _quiet(eng.run, sp, geom, move)

    # dC/ds at s=0 is theta * dR = theta [[0,-1],[1,0]]; C0 = I, S = I:
    # response = theta [[0,-1],[1,0]] whose singular values are both
    # |theta| -> sum = 2 theta
    assert len(eng.LAMBDA_list) == 1
    assert eng.LAMBDA_list[0] == pytest.approx(2 * 0.3, abs=1e-6)
    # first/second orbital-energy derivatives from the mock's linear
    # and quadratic terms
    np.testing.assert_allclose(eng.first_deriv_orbital_ene_list[0],
                               [0.1, 0.0], atol=1e-6)
    np.testing.assert_allclose(eng.second_deriv_orbital_ene_list[0],
                               [0.0, 0.1], atol=1e-3)
    for name in ("NRO_lambda_plot.csv",
                 "1st_derivative_orbital_energy_plot.csv",
                 "2nd_derivative_orbital_energy_plot.csv"):
        assert (tmp_path / name).exists(), name


# ==========================================================================
# Visualization
# ==========================================================================

def test_visualization_live_writes_pngs(tmp_path):
    mod = _ref_module("multioptpy.Visualization.visualization")
    g = mod.Graph(str(tmp_path) + "/")
    n = np.arange(10)
    e = np.sin(n / 3.0)
    _quiet(g.double_plot, n, e, e * 0.5)
    made = list(tmp_path.glob("*.png"))
    assert made, "double_plot wrote no png"

    # NEBVisualizer writes into config.NEB_FOLDER_DIRECTORY — the
    # file_directory argument of simple_plot is DEAD (visualization.py
    # :89,100): pass a bogus path and the png still lands in the config
    # folder
    out = tmp_path / "neb"
    out.mkdir()
    viz = mod.NEBVisualizer(types.SimpleNamespace(
        NEB_FOLDER_DIRECTORY=str(out) + "/"))
    _quiet(viz.plot_energy, list(range(5)),
           [0.0, 0.5, 1.0, 0.4, 0.1], 3)
    assert any("energy" in p.name for p in out.glob("*.png"))
    _quiet(viz.simple_plot, list(range(5)), [1, 2, 3, 2, 1],
           "/nonexistent/dead/arg/", 7)
    assert (out / "plot_data_7.png").exists()
