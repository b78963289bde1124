"""End-to-end on-device QM transition-state search: H2 + H -> H + H2.

The hydrogen-exchange reaction, entirely on the SQM backend: CI-NEB path
search, RS-RFO saddle refinement, frequency confirmation. Literature: the
H3 TS is linear and symmetric with r(HH) ~ 1.757 Bohr and a ~9.6 kcal/mol
barrier; EHT-level SQM reproduces the symmetry exactly and the energetics
to the right order of magnitude.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.analysis import normal_modes
from multioptpy_tpu.analysis.vibrations import count_imaginary
from multioptpy_tpu.calculators.sqm import SQM
from multioptpy_tpu.drivers.neb import NEBConfig, interpolate_linear, neb
from multioptpy_tpu.drivers.optimize import OptimizeConfig
from multioptpy_tpu.workflows.autots import refine_saddle


def test_h3_exchange_ts():
    calc = SQM(kt=0.02, multiplicity=2)
    z = jnp.array([1, 1, 1])
    react = jnp.asarray([[0.0, 0, 0], [1.45, 0, 0], [5.5, 0, 0]])
    prod = jnp.asarray([[0.0, 0, 0], [4.05, 0, 0], [5.5, 0, 0]])

    # reactant and product are symmetry-equivalent: energies degenerate
    e_r = float(calc.energy(react, z))
    e_p = float(calc.energy(prod, z))
    assert e_r == pytest.approx(e_p, abs=1e-10)

    res = neb(calc, interpolate_linear(react, prod, 12), z,
              NEBConfig(variant="cineb", n_steps=300, k_spring=0.02,
                        climbing_start=40, fmax=5e-4, dt0=0.1, dt_max=0.5))
    assert bool(res.converged)

    res2 = refine_saddle(calc, res.path[res.ts_index], z, OptimizeConfig(
        method="rfo_bofill", saddle_order=1, nsteps=80, fc_count=5,
        init_hessian="exact", trust_radius_ang=0.1))
    assert bool(res2.converged)

    # symmetric linear TS
    x = np.asarray(res2.coords[:, 0])
    d1, d2 = x[1] - x[0], x[2] - x[1]
    assert d1 == pytest.approx(d2, abs=1e-3)
    assert 1.5 < d1 < 2.2  # literature 1.757 Bohr; EHT-level window

    # exactly one imaginary mode
    h = calc.hessian(res2.coords, z)
    nm = normal_modes(h, res2.coords, z)
    assert count_imaginary(nm.frequencies_cm1) == 1

    # barrier in the physical range (lit 9.6 kcal/mol; EHT-level window)
    barrier = (float(res2.energy) - e_r) * 627.509
    assert 1.0 < barrier < 25.0
