"""Short on-device SQM2 optimizations of the reference's own molecule
fixtures (test/README.md command recipes) — real-molecule robustness
breadth beyond the flagship: Claisen (14 atoms C/H/O) and Swern (16 atoms
with a sulfonium S, exercising the row-3 d shells) and the Wittig system
(26 atoms with phosphorus)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import get_calculator
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.io import read_xyz
from multioptpy_tpu.periodic import symbols_to_z
from multioptpy_tpu.units import ANGSTROM2BOHR

FIXTURES = "/root/reference/test"


@pytest.mark.parametrize("name", ["claisen_rearrengment",
                                  "swarn_oxidation",
                                  "witting_rxn"])
def test_sqm2_short_optimization(name):
    symbols, coords_ang = read_xyz(f"{FIXTURES}/{name}.xyz")
    z = jnp.asarray(symbols_to_z(symbols))
    coords = jnp.asarray(coords_ang * ANGSTROM2BOHR)
    calc = get_calculator("sqm2")
    res = optimize(calc, coords, z, config=OptimizeConfig(
        method="rfo_fsb", nsteps=25, init_hessian="model:fischerd3"))
    e_hist = np.asarray(res.energy_history)
    assert np.all(np.isfinite(e_hist))
    assert np.all(np.isfinite(np.asarray(res.coords)))
    # relaxation made real progress without tearing the molecule apart
    assert e_hist[-1] < e_hist[0] - 1e-4
    disp = np.linalg.norm(np.asarray(res.coords) - np.asarray(coords),
                          axis=1)
    assert float(disp.max()) < 2.0  # Bohr
