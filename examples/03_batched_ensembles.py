"""Batched + sharded ensemble optimization — the TPU-native superpower.

256 perturbed LJ clusters advance in lockstep; on a multi-chip mesh the
batch shards across devices with zero code changes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize_batch
from multioptpy_tpu.parallel import sharded_optimize_batch
from multioptpy_tpu.periodic import UFF_VDW_R

rmin = float(UFF_VDW_R[18])
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.standard_normal((256, 8, 3)) * rmin * 0.8,
                    dtype=jnp.float32)
z = jnp.array([18] * 8)

cfg = OptimizeConfig(method="rfo_fsb", init_hessian="exact")
if len(jax.devices()) > 1:
    final = sharded_optimize_batch(LennardJones(), batch, z, config=cfg,
                                   n_steps=50)
    energies = np.asarray(final.energy)
else:
    res = optimize_batch(LennardJones(), batch, z, config=cfg, n_steps=50)
    energies = np.asarray(res.energy)
print(f"best cluster energy: {energies.min():.6f} Ha; "
      f"{np.sum(energies < energies.min() + 1e-6)} found the same minimum")
