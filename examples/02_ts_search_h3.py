"""Find the H2 + H exchange transition state: CI-NEB -> saddle -> frequencies.

The complete TS workflow on the on-device QM backend.
"""
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.analysis import normal_modes
from multioptpy_tpu.calculators.sqm import SQM
from multioptpy_tpu.drivers.neb import NEBConfig, interpolate_linear, neb
from multioptpy_tpu.drivers.optimize import OptimizeConfig
from multioptpy_tpu.workflows.autots import refine_saddle

calc = SQM(kt=0.02, multiplicity=2)
z = jnp.array([1, 1, 1])
react = jnp.asarray([[0.0, 0, 0], [1.45, 0, 0], [5.5, 0, 0]])
prod = jnp.asarray([[0.0, 0, 0], [4.05, 0, 0], [5.5, 0, 0]])

path = neb(calc, interpolate_linear(react, prod, 12), z,
           NEBConfig(variant="cineb", n_steps=300, k_spring=0.02,
                     climbing_start=40, fmax=5e-4, dt0=0.1, dt_max=0.5))
ts = refine_saddle(calc, path.path[path.ts_index], z, OptimizeConfig(
    method="rfo_bofill", saddle_order=1, nsteps=80, fc_count=5,
    init_hessian="exact", trust_radius_ang=0.1))
nm = normal_modes(calc.hessian(ts.coords, z), ts.coords, z)
barrier = (float(ts.energy) - float(calc.energy(react, z))) * 627.509
print(f"TS: {np.asarray(ts.coords[:, 0]).round(4)} (x coords, Bohr)")
print(f"imaginary mode: {float(nm.frequencies_cm1[0]):.0f} cm^-1")
print(f"barrier: {barrier:.1f} kcal/mol (literature ~9.6)")
