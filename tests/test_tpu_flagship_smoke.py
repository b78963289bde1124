"""TPU-gated flagship physics smoke (VERDICT r4 item 3 / weak #2).

The round-4 flagship bench row reported nan barriers on TPU while the
CPU flagship test passed — nothing on TPU asserted the physics. This
smoke runs a REDUCED flagship AutoTS (single candidate, shortened
stages) on the real chip and asserts finite barriers + exactly one
imaginary mode, so a TPU-side step-math regression (emulated-f64 eigh,
trust logic, Hessian rebuilds) can't pass silently again.

Skips cleanly off-TPU — the CPU suite runs tests/test_flagship_autots.py
instead. Run on the chip with:

    PYTHONPATH=/root/repo python -m pytest tests/test_tpu_flagship_smoke.py -q
"""

import numpy as np
import pytest


def _on_tpu():
    import jax
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@pytest.mark.slow
def test_tpu_flagship_reduced_autots():
    if not _on_tpu():
        pytest.skip("needs the real TPU backend")
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        import jax.numpy as jnp

        from multioptpy_tpu.calculators.sqm import SQM2
        from multioptpy_tpu.drivers.irc import IRCConfig
        from multioptpy_tpu.drivers.neb import NEBConfig
        from multioptpy_tpu.drivers.optimize import OptimizeConfig
        from multioptpy_tpu.io.fixtures import diels_alder_reactant
        from multioptpy_tpu.workflows.autots import AutoTSConfig, autots

        coords, z = diels_alder_reactant()
        cfg = AutoTSConfig(
            afir_list=[(300.0, [1], [11]), (300.0, [4], [12])],
            afir_opt=OptimizeConfig(method="rfo_fsb", nsteps=150,
                                    init_hessian="model:lindh2007d3_raw",
                                    fc_count=-1, mfc_count=30),
            n_images=8,
            neb=NEBConfig(variant="cineb", n_steps=80, k_spring=0.01,
                          climbing_start=30, fmax=5e-4, dt0=0.05,
                          dt_max=0.2),
            top_n_candidates=1,
            saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1,
                                  nsteps=80, fc_count=5,
                                  init_hessian="exact"),
            irc=IRCConfig(method="lqa", step_size=0.12, n_steps=30),
            endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=80,
                                        init_hessian="model:lindh2007d3_raw"),
        )
        res = autots(SQM2(), jnp.asarray(coords, jnp.float64),
                     jnp.asarray(z), cfg)
        assert np.isfinite(res.barrier_forward), res.barrier_forward
        assert np.isfinite(res.barrier_backward), res.barrier_backward
        assert res.barrier_forward > 0.0
        assert int(res.n_imaginary) == 1
        assert np.all(np.isfinite(np.asarray(res.ts_coords)))
    finally:
        jax.config.update("jax_enable_x64", False)
