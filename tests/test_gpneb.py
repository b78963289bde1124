"""GP-accelerated NEB: surrogate relaxation with few true evaluations."""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_C,
    MullerBrown,
)
from multioptpy_tpu.drivers.gpneb import GPNEBConfig, gpneb
from multioptpy_tpu.drivers.neb import interpolate_linear


def test_gpneb_relaxes_band_with_budgeted_evals():
    calc = MullerBrown()
    z = jnp.array([1])
    start = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    end = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    path0 = interpolate_linear(start, end, 10)
    res = gpneb(calc, path0, z, GPNEBConfig(
        n_outer=6, n_inner=50, k_spring=5e-4, lengthscale=0.6,
        dt0=0.05, dt_max=0.2, fmax=2e-3))
    e = np.asarray(res.energies)
    assert np.all(np.isfinite(e))
    # eval budget: at most n_outer rounds of true calls (vs hundreds for
    # a direct NEB at the same inner step count)
    assert res.n_true_evaluations <= 6 * 10
    # the band leaves the straight line and climbs over a barrier
    assert e[res.ts_index] > max(e[0], e[-1])
    d_moved = float(jnp.max(jnp.abs(res.path - path0)))
    assert d_moved > 0.05
