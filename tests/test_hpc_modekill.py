"""HPC IRC integrator and ModeKill higher-order-saddle cleanup."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.drivers.irc import IRCConfig, irc, modekill


def test_hpc_irc_reaches_minima():
    calc = MullerBrown()
    coords = jnp.array([[MB_TS_AB[0], MB_TS_AB[1], 0.0]])
    z = jnp.array([1])
    res = irc(calc, coords, z, config=IRCConfig(
        method="hpc", step_size=0.06, n_steps=120, grad_threshold=2e-5,
        init_displacement=0.05))
    ends = [np.asarray(res.forward_path[-1, 0, :2]),
            np.asarray(res.backward_path[-1, 0, :2])]
    targets = [np.asarray(MB_MIN_A), np.asarray(MB_MIN_B)]
    d = np.array([[np.linalg.norm(e - t) for t in targets] for e in ends])
    assert min(d[0, 0] + d[1, 1], d[0, 1] + d[1, 0]) < 0.05


def test_modekill_cleans_maximum_to_minimum():
    # start at a 2D local MAXIMUM region: between the saddles the MB surface
    # has points with 2 negative curvatures; modekill with keep_order=0
    # must walk down to a real minimum (no imaginary modes left)
    calc = MullerBrown()
    z = jnp.array([1])
    x0 = jnp.array([[-0.75, 0.9, 0.0]])  # uphill region near A-B ridge
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    coords, n_imag = modekill(
        calc, x0, z, keep_order=0, max_rounds=20, step_size=0.1,
        opt_config=OptimizeConfig(method="rfo_fsb", nsteps=80, fc_count=5,
                                  max_force=1e-6, rms_force=7e-7,
                                  max_displacement=1e-4,
                                  rms_displacement=7e-5))
    assert n_imag == 0
    # landed on one of the three MB minima
    from multioptpy_tpu.calculators.model_surfaces import MB_MIN_B, MB_MIN_C
    mins = [MB_MIN_A, MB_MIN_B, MB_MIN_C]
    d = min(np.linalg.norm(np.asarray(coords[0, :2]) - np.asarray(m))
            for m in mins)
    assert d < 0.05
