"""Polar coordinates, EDEEL diabatic states, conformer-search restart."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.coords.polar import cart2polar, polar2cart, polar_jacobian


class TestPolar:
    @pytest.mark.parametrize("n", [2, 3, 6])
    def test_roundtrip(self, rng, n):
        x = jnp.asarray(rng.normal(size=n))
        p = cart2polar(x)
        np.testing.assert_allclose(np.asarray(polar2cart(p)), np.asarray(x),
                                   atol=1e-12)
        assert float(p[0]) == pytest.approx(float(jnp.linalg.norm(x)))

    def test_reference_point(self, rng):
        x = jnp.asarray(rng.normal(size=3))
        ref = jnp.asarray([1.0, 2.0, 3.0])
        p = cart2polar(x, ref)
        np.testing.assert_allclose(np.asarray(polar2cart(p, ref)),
                                   np.asarray(x), atol=1e-12)

    def test_jacobian_full_rank(self, rng):
        p = jnp.asarray([2.0, 0.7, 1.1, 0.4])
        j = polar_jacobian(p)
        assert abs(float(jnp.linalg.det(j))) > 1e-6


def test_edeel_diabatic_gap_and_gradient():
    from multioptpy_tpu.calculators.edeel import EDEELCalculator
    from multioptpy_tpu.calculators.sqm import SQM

    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.5],
                          [6.0, 0.0, 0.0], [6.0, 0.0, 1.5]])
    z = jnp.array([1, 1, 1, 1])
    ed = EDEELCalculator(lambda **kw: SQM(kt=0.02, **kw),
                         donor_atoms=[1, 2], acceptor_atoms=[3, 4],
                         charges=dict(d_init=0, a_init=0,
                                      d_final=1, a_final=-1),
                         target="sx", sigma=1.0)
    v11, v22 = ed.diabatic_energies(coords, z)
    # neutral pair must lie below the charge-separated pair at 6 bohr
    assert float(v11) < float(v22)
    e, g = ed.energy_and_gradient(coords, z)
    assert np.all(np.isfinite(np.asarray(g)))
    # target switching
    ed.target = "reactant"
    assert float(ed.energy(coords, z)) == pytest.approx(float(v11))


def test_confsearch_restart(tmp_path, rng):
    from multioptpy_tpu.calculators import LennardJones
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    from multioptpy_tpu.periodic import UFF_VDW_R
    from multioptpy_tpu.workflows.confsearch import (
        ConfSearchConfig, conformer_search, load_search_state)

    rmin = float(UFF_VDW_R[18])
    coords = jnp.asarray(rng.standard_normal((5, 3)) * rmin * 0.5)
    z = jnp.array([18] * 5)
    cfg = ConfSearchConfig(n_rounds=2, batch_size=4, base_gamma=60.0,
                           kick_steps=30, relax_steps=40,
                           preserve_bonds=False, seed=3,
                           opt=OptimizeConfig(method="rfo_fsb",
                                              max_force=1e-6, rms_force=7e-7,
                                              max_displacement=1e-4,
                                              rms_displacement=7e-5))
    restart = str(tmp_path / "cs.npz")
    res1 = conformer_search(LennardJones(), coords, z, cfg,
                            restart_file=restart)
    assert os.path.exists(restart)
    found, energies, visits = load_search_state(restart)
    assert len(found) == len(res1.energies)
    # resuming continues from the saved library without re-seeding
    res2 = conformer_search(LennardJones(), coords, z, cfg,
                            restart_file=restart)
    assert len(res2.energies) >= len(res1.energies)
