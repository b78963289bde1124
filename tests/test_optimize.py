"""End-to-end optimization driver on the pure-JAX LJ backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers import OptimizeConfig, optimize, optimize_batch
from multioptpy_tpu.periodic import UFF_VDW_R
from multioptpy_tpu.potentials import BiasEngine, get_potential

RMIN = float(UFF_VDW_R[18])  # Ar-Ar UFF minimum distance (Bohr)


@pytest.fixture(scope="module")
def ar3():
    # perturbed equilateral Ar3, equilibrium side = RMIN
    c = np.array([[0.0, 0.0, 0.0], [RMIN * 1.13, 0.0, 0.0],
                  [RMIN * 0.5, RMIN * 0.99, 0.1]])
    return jnp.asarray(c), jnp.array([18, 18, 18])


class TestSingle:
    def test_rfo_fsb_converges(self, ar3):
        coords, z = ar3
        calc = LennardJones()
        # LJ forces are ~1e-5 a.u. — default (QM-scale) criteria would stop
        # far from the minimum, so use tight thresholds here
        res = optimize(calc, coords, z, config=OptimizeConfig(
            method="rfo_fsb", nsteps=200, max_force=1e-6, rms_force=7e-7,
            max_displacement=1e-4, rms_displacement=7e-5))
        assert bool(res.converged)
        # equilateral triangle at r = RMIN
        d01 = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
        d02 = float(jnp.linalg.norm(res.coords[0] - res.coords[2]))
        d12 = float(jnp.linalg.norm(res.coords[1] - res.coords[2]))
        for d in (d01, d02, d12):
            assert d == pytest.approx(RMIN, rel=5e-3)
        # energies monotone-ish decreasing overall
        assert res.energy_history[-1] < res.energy_history[0]
        assert float(jnp.max(jnp.abs(res.gradient))) < 1e-5

    def test_fire_converges(self, ar3):
        coords, z = ar3
        res = optimize(LennardJones(), coords, z, config=OptimizeConfig(
            method="fire", nsteps=600, max_force=3e-6, rms_force=2e-6,
            max_displacement=5e-3, rms_displacement=3e-3))
        assert bool(res.converged)
        d01 = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
        assert d01 == pytest.approx(RMIN, rel=2e-2)

    def test_afir_bias_compresses(self, ar3):
        coords, z = ar3
        bias = BiasEngine([get_potential(
            "afir", gamma=80.0, fragm_1=[1], fragm_2=[2],
            element_z=np.asarray(z))])
        # the AFIR-compressed r^-12 wall is strongly anharmonic: periodic
        # exact-Hessian rebuilds (fc_count, ref: optimization.py:1884) keep
        # the quasi-Newton model honest there
        res = optimize(LennardJones(), coords, z, bias_engine=bias,
                       config=OptimizeConfig(method="rfo_fsb", nsteps=200,
                                             max_force=1e-5, rms_force=7e-6,
                                             fc_count=10))
        assert bool(res.converged)
        d_biased = float(jnp.linalg.norm(res.coords[0] - res.coords[1]))
        assert d_biased < RMIN * 0.98  # pushed inside the free minimum


class TestBatch:
    def test_batch_matches_single(self, ar3):
        coords, z = ar3
        batch = jnp.stack([coords, coords * 1.02, coords * 0.98,
                           coords + 0.05])
        res_b = optimize_batch(LennardJones(), batch, z,
                               config=OptimizeConfig(
                                   method="rfo_fsb", max_force=1e-6,
                                   rms_force=7e-7, max_displacement=1e-4,
                                   rms_displacement=7e-5),
                               n_steps=80)
        assert res_b.converged.shape == (4,)
        assert bool(jnp.all(res_b.converged))
        # all members land on the same equilateral minimum energy
        e = np.asarray(res_b.energy)
        np.testing.assert_allclose(e, e[0], rtol=1e-8)
        res_s = optimize(LennardJones(), coords, z,
                         config=OptimizeConfig(
                             method="rfo_fsb", nsteps=200, max_force=1e-6,
                             rms_force=7e-7, max_displacement=1e-4,
                             rms_displacement=7e-5))
        assert e[0] == pytest.approx(float(res_s.energy), rel=1e-9)
