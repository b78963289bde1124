"""Two-point scaled hypersphere search."""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.drivers.twopshs import TwoPSHSConfig, twopshs


def test_2pshs_crosses_ts_between_minima():
    calc = MullerBrown()
    z = jnp.array([1])
    a = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    b = jnp.array([[MB_MIN_B[0], MB_MIN_B[1], 0.0]])
    res = twopshs(calc, a, b, z, TwoPSHSConfig(
        r_start=0.15, r_step=0.08, n_relax=60, relax_rate=0.1))
    assert res.crossed_ts
    d = np.linalg.norm(np.asarray(res.ts_guess)[0, :2] - np.asarray(MB_TS_AB))
    assert d < 0.05
    assert res.ts_energy / 1e-3 == np.float64(res.ts_energy / 1e-3)
    assert abs(res.ts_energy / 1e-3 - (-40.665)) < 0.5
    # path climbs monotonically until the crossing
    e = res.energies
    peak = int(np.argmax(e))
    assert np.all(np.diff(e[: peak + 1]) > -1e-10)
