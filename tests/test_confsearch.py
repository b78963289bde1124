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


def test_early_termination_rank_list_stable():
    """Reference -nr/-nl semantics (conformation_search.py:675-686): once
    more than number_of_rank conformers exist and the lowest-rank energy
    list stops changing, the search exits before n_rounds."""
    rng = np.random.default_rng(5)
    coords = jnp.asarray(rng.standard_normal((6, 3)) * RMIN * 0.5)
    z = jnp.array([18] * 6)
    cfg = ConfSearchConfig(
        n_rounds=40, batch_size=8, base_gamma=60.0, kick_steps=40,
        relax_steps=60,
        opt=OptimizeConfig(method="rfo_fsb", max_force=1e-6, rms_force=7e-7,
                           max_displacement=1e-4, rms_displacement=7e-5),
        preserve_bonds=False, dedupe_threshold=0.05, seed=1,
        number_of_rank=1, number_of_lowest=1)
    res = conformer_search(LennardJones(), coords, z, cfg)
    # stopped well before 40 rounds x 8 candidates
    assert res.n_generated < 40 * 8


def test_no_stochastic_and_target_atoms():
    """-nost keeps every kick on the initial EQ; -tgta restricts AFIR
    pairs to the given 1-indexed atoms (needs >= 2)."""
    import pytest

    rng = np.random.default_rng(7)
    coords = jnp.asarray(rng.standard_normal((5, 3)) * RMIN * 0.5)
    z = jnp.array([18] * 5)
    cfg = ConfSearchConfig(
        n_rounds=2, batch_size=4, base_gamma=60.0, kick_steps=30,
        relax_steps=50, preserve_bonds=False, dedupe_threshold=0.05,
        seed=2, stochastic=False, target_atoms=(1, 3, 5))
    res = conformer_search(LennardJones(), coords, z, cfg)
    assert len(res.energies) >= 1
    with pytest.raises(ValueError):
        conformer_search(LennardJones(), coords, z,
                         ConfSearchConfig(n_rounds=1, batch_size=2,
                                          target_atoms=(2,)))
