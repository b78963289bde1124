"""AutoTS pipeline and saddle refinement on Muller-Brown."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_MIN_C,
    MB_TS_AB,
    MullerBrown,
    muller_brown_energy,
)
from multioptpy_tpu.drivers.optimize import OptimizeConfig
from multioptpy_tpu.workflows.autots import AutoTSConfig, autots, refine_saddle


def test_refine_saddle_from_offset_guess():
    calc = MullerBrown()
    z = jnp.array([1])
    guess = jnp.array([[MB_TS_AB[0] + 0.07, MB_TS_AB[1] - 0.05, 0.0]])
    res = refine_saddle(calc, guess, z, OptimizeConfig(
        method="rfo_bofill", saddle_order=1, nsteps=100, fc_count=3,
        init_hessian="exact", trust_radius_ang=0.1,
        max_force=1e-7, rms_force=7e-8, max_displacement=1e-5,
        rms_displacement=7e-6))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.coords[0, :2]), MB_TS_AB,
                               atol=1e-5)


def test_autots_full_pipeline_with_product():
    calc = MullerBrown()
    z = jnp.array([1])
    reactant = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    product = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    cfg = AutoTSConfig(
        n_images=14,
        saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1,
                              nsteps=100, fc_count=3, init_hessian="exact",
                              trust_radius_ang=0.1, max_force=1e-7,
                              rms_force=7e-8, max_displacement=1e-5,
                              rms_displacement=7e-6),
        endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=150,
                                    max_force=1e-7, rms_force=7e-8,
                                    max_displacement=1e-5,
                                    rms_displacement=7e-6),
    )
    res = autots(calc, reactant, z, cfg, product_coords=product)

    # TS refined onto the exact higher saddle
    np.testing.assert_allclose(np.asarray(res.ts_coords[0, :2]), MB_TS_AB,
                               atol=1e-5)
    assert res.n_imaginary == 1
    # TS energy matches the analytic MB saddle energy (scale 1e-3)
    e_ts_mb = res.ts_energy / 1e-3
    assert e_ts_mb == pytest.approx(float(muller_brown_energy(*MB_TS_AB)),
                                    abs=1e-6)
    # IRC endpoints optimized to minima A and B
    ends = [np.asarray(res.reactant_coords[0, :2]),
            np.asarray(res.product_coords[0, :2])]
    targets = [np.asarray(MB_MIN_A), np.asarray(MB_MIN_B)]
    d = np.array([[np.linalg.norm(e - t) for t in targets] for e in ends])
    assert min(d[0, 0] + d[1, 1], d[0, 1] + d[1, 0]) < 1e-4
    # barriers positive from both sides
    assert res.barrier_forward > 0 and res.barrier_backward > 0
