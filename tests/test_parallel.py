"""Device-mesh sharding of ensembles (8 virtual CPU devices via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize_batch
from multioptpy_tpu.parallel import ensemble_mesh, shard_batch, sharded_optimize_batch
from multioptpy_tpu.periodic import UFF_VDW_R

RMIN = float(UFF_VDW_R[18])


@pytest.fixture(scope="module")
def batch16(rng=None):
    rng = np.random.default_rng(11)
    base = np.array([[0.0, 0.0, 0.0], [RMIN * 1.1, 0.0, 0.0],
                     [RMIN * 0.5, RMIN * 0.95, 0.05]])
    return jnp.asarray(np.stack([
        base + 0.1 * rng.standard_normal(base.shape) for _ in range(16)]))


def test_mesh_has_eight_devices():
    mesh = ensemble_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices


def test_shard_batch_places_leading_axis(batch16):
    mesh = ensemble_mesh()
    sharded = shard_batch(batch16, mesh)
    # the leading axis is split across the mesh
    spec = sharded.sharding.spec
    assert spec[0] == "batch"


def test_sharded_optimization_matches_unsharded(batch16):
    z = jnp.array([18, 18, 18])
    cfg = OptimizeConfig(method="rfo_fsb", max_force=1e-6, rms_force=7e-7,
                         max_displacement=1e-4, rms_displacement=7e-5)
    final = sharded_optimize_batch(LennardJones(), batch16, z,
                                   config=cfg, n_steps=50)
    res_ref = optimize_batch(LennardJones(), batch16, z, config=cfg,
                             n_steps=50)
    # sharded and single-device results agree
    np.testing.assert_allclose(np.asarray(final.energy),
                               np.asarray(res_ref.energy), rtol=1e-10)
    assert bool(jnp.all(final.converged))
