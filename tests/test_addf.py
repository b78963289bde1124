"""ADDF / scaled-hypersphere-search channel following."""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_B,
    MB_TS_AB,
    MB_TS_BC,
    MullerBrown,
)
from multioptpy_tpu.drivers.addf import ADDFConfig, addf_search


def test_addf_finds_both_channels_from_minimum_b():
    calc = MullerBrown()
    z = jnp.array([1])
    b = jnp.array([[MB_MIN_B[0], MB_MIN_B[1], 0.0]])
    channels = addf_search(calc, b, z, ADDFConfig(
        n_channels=4, r_start=0.2, r_step=0.08, n_spheres=40, n_relax=60,
        relax_rate=0.15))
    crossed = [c for c in channels if c.crossed_ts]
    assert len(crossed) >= 2
    ts_points = [np.asarray(c.ts_guess)[0, :2] for c in crossed]
    targets = [np.asarray(MB_TS_AB), np.asarray(MB_TS_BC)]
    # each target saddle matched by some channel within 0.1
    for t in targets:
        assert min(np.linalg.norm(p - t) for p in ts_points) < 0.1
    # channel energetics sane: TS guesses above the minimum
    e_b = float(calc.energy(b, z))
    for c in crossed:
        assert c.ts_energy > e_b
