"""Sharded NEB (image axis over the mesh, ppermute halos) must match the
single-device band step numerically (SURVEY §5.8 item 2; replaces the
reference's sequential per-image loop at
ref: Calculator/tblite_calculation_tools.py:312)."""

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.lj import LennardJones
from multioptpy_tpu.drivers.neb import (
    NEBConfig, make_neb_step, neb_init, neb_sharded, neb_sharded_step)
from multioptpy_tpu.parallel.mesh import ensemble_mesh, shard_batch
from multioptpy_tpu.steppers.first_order import fire_init


def _setup(n_images=16):
    z = jnp.array([18, 18, 18])
    a = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 6.8], [0.0, 6.8, 0.0]])
    b = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 9.0], [0.0, 7.4, 3.0]])
    t = np.linspace(0.0, 1.0, n_images)[:, None, None]
    path = (1 - t) * a[None] + t * b[None]
    rng = np.random.default_rng(7)
    noise = 0.05 * rng.standard_normal(path.shape)
    noise[0] = noise[-1] = 0.0
    return jnp.asarray(path + noise), z


def test_sharded_step_matches_single_device():
    path0, z = _setup()
    calc = LennardJones()
    config = NEBConfig(variant="cineb", optimizer="fire", climbing_start=5,
                       n_steps=20)

    # single-device whole-band step
    step1 = jax.jit(make_neb_step(calc, z, config))
    fire = fire_init(path0.size, path0.dtype, dt0=config.dt0)
    path_ref = path0
    for it in range(1, 21):
        path_ref, fire, energies_ref, fmax_ref = step1(
            path_ref, fire, jnp.asarray(it))

    # sharded step over an 8-device CPU mesh
    mesh = ensemble_mesh(8, axis="batch")
    state = shard_batch(neb_init(path0, z, calc, config), mesh)
    step8 = jax.jit(neb_sharded_step(calc, z, config, mesh))
    for _ in range(20):
        state = step8(state)

    np.testing.assert_allclose(np.asarray(state.coords),
                               np.asarray(path_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(state.energies),
                               np.asarray(energies_ref), atol=1e-10)
    np.testing.assert_allclose(float(state.fmax), float(fmax_ref),
                               atol=1e-12)


def test_neb_sharded_scan_runs_and_relaxes():
    path0, z = _setup()
    calc = LennardJones()
    config = NEBConfig(variant="cineb", optimizer="fire", n_steps=30)
    mesh = ensemble_mesh(8, axis="batch")
    res = neb_sharded(calc, path0, z, config, mesh=mesh)
    assert res.path.shape == path0.shape
    # the band must have relaxed: force dropped from the initial state
    assert float(res.energy_history[-1].max()) <= float(
        res.energy_history[0].max()) + 1e-12
