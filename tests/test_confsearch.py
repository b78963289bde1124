"""Conformer search on an LJ cluster (multiple known minima)."""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers.optimize import OptimizeConfig
from multioptpy_tpu.periodic import UFF_VDW_R
from multioptpy_tpu.workflows.confsearch import ConfSearchConfig, conformer_search

RMIN = float(UFF_VDW_R[18])


def test_lj6_finds_multiple_minima():
    # LJ6 has two well-known minima: octahedron (global) and a C2v packing
    rng = np.random.default_rng(5)
    coords = jnp.asarray(rng.standard_normal((6, 3)) * RMIN * 0.5)
    z = jnp.array([18] * 6)
    cfg = ConfSearchConfig(
        n_rounds=4, batch_size=8, base_gamma=60.0, kick_steps=40,
        relax_steps=60,
        opt=OptimizeConfig(method="rfo_fsb", max_force=1e-6, rms_force=7e-7,
                           max_displacement=1e-4, rms_displacement=7e-5),
        preserve_bonds=False, dedupe_threshold=0.05, seed=1)
    res = conformer_search(LennardJones(), coords, z, cfg)
    assert len(res.energies) >= 2           # found more than one minimum
    assert np.all(np.diff(res.energies) >= -1e-12)  # sorted
    # global LJ6 minimum (octahedron) energy: -12.712 epsilon... in UFF-Ar
    # units just check the best is bound and finite
    assert res.energies[0] < 0.0
    assert res.conformers.shape[1:] == (6, 3)
