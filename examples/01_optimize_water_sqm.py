"""Optimize water with the on-device semiempirical QM backend.

Run: PYTHONPATH=.. python 01_optimize_water_sqm.py (CPU)
     python 01_optimize_water_sqm.py (TPU, default env)
"""
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.sqm import SQM
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM

coords = jnp.asarray(np.array([
    [0.0, 0.0, 0.0], [0.0, 1.1, -0.5], [0.0, -1.0, -0.65]]) * ANGSTROM2BOHR)
z = jnp.array([8, 1, 1])

res = optimize(SQM(), coords, z,
               config=OptimizeConfig(method="rfo_fsb", nsteps=100, fc_count=10))
print(f"converged: {bool(res.converged)} in {res.n_iterations} steps")
print("final geometry (Angstrom):")
print(np.asarray(res.coords) * BOHR2ANGSTROM)
