"""Metadynamics on an LJ dimer: hills fill the bond-length well."""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers.md import MDConfig
from multioptpy_tpu.periodic import UFF_VDW_R
from multioptpy_tpu.workflows.metadynamics import (
    MetadynamicsConfig,
    run_metadynamics,
)

RMIN = float(UFF_VDW_R[18])


def test_metadynamics_fills_the_well():
    coords = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, RMIN]])
    z = jnp.array([18, 18])
    cfg = MetadynamicsConfig(
        md=MDConfig(thermostat="langevin", temperature=40.0,
                    timestep_fs=3.0, friction_fs=0.05, seed=7),
        height_kjmol=1.5, width_ang=0.25, deposit_every=25, n_hills=12,
        cv_atom_pair=(1, 2))
    res = run_metadynamics(LennardJones(), coords, z, cfg)
    assert res.hill_centers.shape == (12,)
    assert np.all(np.isfinite(res.trajectory))
    # hills concentrated around the bond minimum region; CV explores
    assert res.cv_history.std() > 0.0
    # accumulated bias is negative (a filled well) near the minimum
    i_min = np.argmin(np.abs(res.free_energy_cv - RMIN))
    assert res.free_energy[i_min] < -1e-3
