"""Two-state model functions (seam/MECI/avoiding) and BITSS."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.base import Calculator
from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.calculators.two_state import (
    BITSSCalculator,
    TwoStateModelFunction,
    bitss_search,
)
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize


class Harmonic(Calculator):
    """0.5 k |x - x0|^2 + e0 toy surface."""

    on_device = True

    def __init__(self, center, e0=0.0, k=1.0, **kw):
        super().__init__(**kw)
        self.center = jnp.asarray(center)
        self.e0 = float(e0)
        self.k = float(k)

    def energy(self, coords, z):
        return 0.5 * self.k * jnp.sum((coords - self.center) ** 2) + self.e0


@pytest.fixture
def crossing_pair():
    c1 = Harmonic(jnp.array([[0.0, 0.0, 0.0]]), e0=0.0)
    c2 = Harmonic(jnp.array([[2.0, 0.0, 0.0]]), e0=0.5)
    return c1, c2


CFG = OptimizeConfig(method="rfo_fsb", nsteps=200, project_tr_rot=False,
                     fc_count=5, max_force=1e-7, rms_force=7e-8,
                     max_displacement=1e-5, rms_displacement=7e-6)


@pytest.mark.parametrize("kind", ["seam", "meci", "mesx"])
def test_seam_family_closes_the_gap(crossing_pair, kind):
    c1, c2 = crossing_pair
    mf = TwoStateModelFunction(c1, c2, kind=kind, alpha=0.02, sigma=3.5,
                               kappa=50.0)
    x0 = jnp.array([[0.6, 0.4, -0.2]])
    z = jnp.array([1])
    res = optimize(mf, x0, z, config=CFG)
    gap = abs(float(mf.gap(res.coords, z)))
    # analytic crossing seam of the two paraboloids: x = 1.25 plane
    assert gap < 0.02
    assert res.coords[0, 0] == pytest.approx(1.25, abs=0.03)
    # the seam minimum is at y = z = 0
    assert abs(float(res.coords[0, 1])) < 0.02
    assert abs(float(res.coords[0, 2])) < 0.02


def test_mesx2_gradient_projection(crossing_pair):
    """mesx2 (gradient-projection MESX, ref: opt_mesx_2.py): the composed
    force drives the gap to zero and then minimizes in the seam."""
    c1, c2 = crossing_pair
    mf = TwoStateModelFunction(c1, c2, kind="mesx2")
    x0 = jnp.array([[0.6, 0.4, -0.2]])
    z = jnp.array([1])
    # GP force is non-conservative; use a first-order engine
    cfg = OptimizeConfig(method="fire", nsteps=400, project_tr_rot=False,
                         max_force=1e-6, rms_force=7e-7)
    res = optimize(mf, x0, z, config=cfg)
    gap = abs(float(mf.gap(res.coords, z)))
    assert gap < 1e-3
    assert res.coords[0, 0] == pytest.approx(1.25, abs=0.02)
    assert abs(float(res.coords[0, 1])) < 0.02


def test_mesx2_matches_reference_formula_live(crossing_pair):
    """Execute the reference's OptMESX2.calc_grad/calc_hess on the same
    state energies/gradients/Hessians and compare ours exactly."""
    import os
    import sys
    import types

    ref_root = "/root/reference/multioptpy"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree not mounted")
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [ref_root]
        sys.modules["multioptpy"] = pkg
    import importlib

    mesx2_mod = importlib.import_module("multioptpy.ModelFunction.opt_mesx_2")

    c1, c2 = crossing_pair
    mf = TwoStateModelFunction(c1, c2, kind="mesx2")
    x = jnp.array([[0.7, 0.3, -0.1]])
    z = jnp.array([1])

    e1 = float(c1.energy(x, z))
    e2 = float(c2.energy(x, z))
    g1 = np.asarray(c1.gradient(x, z))
    g2 = np.asarray(c2.gradient(x, z))
    h1 = np.asarray(c1.hessian(x, z))
    h2 = np.asarray(c2.hessian(x, z))

    ref = mesx2_mod.OptMESX2()
    import contextlib
    import io
    with contextlib.redirect_stdout(io.StringIO()):
        ref_e = ref.calc_energy(e1, e2)
        ref_g = np.asarray(ref.calc_grad(e1, e2, g1.copy(), g2.copy()))
        ref_h = np.asarray(ref.calc_hess(g1.reshape(-1, 1).copy(),
                                         g2.reshape(-1, 1).copy(),
                                         h1.copy(), h2.copy()))

    our_e, our_g = mf.energy_and_gradient(x, z)
    our_h = np.asarray(mf.hessian(x, z))

    assert float(our_e) == pytest.approx(ref_e, abs=1e-12)
    assert np.allclose(np.asarray(our_g), ref_g, atol=1e-12)
    assert np.allclose(our_h, ref_h, atol=1e-12)


def test_avoiding_surface_smooth(crossing_pair):
    c1, c2 = crossing_pair
    mf = TwoStateModelFunction(c1, c2, kind="avoiding", coupling=1e-3)
    x0 = jnp.array([[1.1, 0.1, 0.0]])
    z = jnp.array([1])
    e, g = mf.energy_and_gradient(x0, z)
    assert np.all(np.isfinite(np.asarray(g)))
    res = optimize(mf, x0, z, config=CFG)
    # the avoiding model is the UPPER adiabatic surface: its minimum sits at
    # the avoided crossing (the x = 1.25 seam)
    assert float(res.coords[0, 0]) == pytest.approx(1.25, abs=0.05)


def test_bitss_finds_mb_saddle_region():
    calc = MullerBrown()
    z = jnp.array([1])
    a = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    b = jnp.array([[MB_MIN_B[0], MB_MIN_B[1], 0.0]])
    ts_guess, e = bitss_search(calc, a, b, z, n_stages=10)
    d = np.linalg.norm(np.asarray(ts_guess[0, :2]) - np.asarray(MB_TS_AB))
    assert d < 0.3  # lands in the saddle region (refine_saddle polishes it)
