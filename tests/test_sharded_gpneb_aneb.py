"""Sharded GPNEB + sharded adaptive NEB == their single-device runs.

VERDICT r4 item 6: the gather-variant sharded path covered 12 NEB force
laws but GPNEB and in-run ANEB insertion were single-device only
(ref: MEP/pathopt_gpneb_force.py:154; neb.py:610 _exec_adaptive_neb).
GPNEB shards the true-evaluation fan-out + surrogate relaxation over the
image axis; ANEB runs each fixed-size segment through neb_sharded with
host-side re-partition between segments.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.lj import LennardJones
from multioptpy_tpu.calculators.model_surfaces import (MB_MIN_A, MB_MIN_C,
                                                       MullerBrown)
from multioptpy_tpu.drivers.gpneb import GPNEBConfig, gpneb
from multioptpy_tpu.drivers.neb import (NEBConfig, aneb_sharded,
                                        interpolate_linear)
from multioptpy_tpu.parallel.mesh import ensemble_mesh


def test_gpneb_sharded_matches_single_device():
    calc = MullerBrown()
    z = jnp.array([1])
    start = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
    end = jnp.array([[MB_MIN_C[0], MB_MIN_C[1], 0.0]])
    path0 = interpolate_linear(start, end, 16)
    cfg = GPNEBConfig(n_outer=3, n_inner=30, k_spring=5e-4,
                      lengthscale=0.6, dt0=0.05, dt_max=0.2, fmax=2e-3)
    res1 = gpneb(calc, path0, z, cfg)
    mesh = ensemble_mesh(8, axis="batch")
    res8 = gpneb(calc, path0, z, cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res8.path),
                               np.asarray(res1.path), atol=1e-10)
    np.testing.assert_allclose(np.asarray(res8.energies),
                               np.asarray(res1.energies), atol=1e-10)
    assert res8.n_true_evaluations == res1.n_true_evaluations


def test_aneb_sharded_grows_band_and_relaxes():
    z = jnp.array([18, 18, 18])
    a = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 6.8], [0.0, 6.8, 0.0]])
    b = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 9.0], [0.0, 7.4, 3.0]])
    path0 = interpolate_linear(jnp.asarray(a), jnp.asarray(b), 8)
    calc = LennardJones()
    cfg = NEBConfig(variant="cineb", optimizer="fire", climbing_start=5,
                    n_steps=20, fmax=1e-9)
    mesh = ensemble_mesh(8, axis="batch")
    res = aneb_sharded(calc, path0, z, cfg, interpolation_num=1,
                       frequency=6, max_images=32, mesh=mesh)
    e = np.asarray(res.energies)
    assert np.all(np.isfinite(e))
    assert res.path.shape[0] % 8 == 0          # stays mesh-shardable
    assert res.path.shape[0] >= 8


def test_aneb_sharded_matches_one_device_mesh():
    # 8-device vs 1-device mesh: identical host-side control flow,
    # identical numerics
    z = jnp.array([18, 18, 18])
    a = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 6.8], [0.0, 6.8, 0.0]])
    b = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 9.0], [0.0, 7.4, 3.0]])
    path0 = interpolate_linear(jnp.asarray(a), jnp.asarray(b), 8)
    calc = LennardJones()
    cfg = NEBConfig(variant="cineb", optimizer="fire", climbing_start=5,
                    n_steps=12, fmax=1e-9)
    res8 = aneb_sharded(calc, path0, z, cfg, interpolation_num=1,
                        frequency=6, max_images=32, round_to=8,
                        mesh=ensemble_mesh(8, axis="batch"))
    res1 = aneb_sharded(calc, path0, z, cfg, interpolation_num=1,
                        frequency=6, max_images=32, round_to=8,
                        mesh=ensemble_mesh(1, axis="batch"))
    assert res8.path.shape == res1.path.shape
    np.testing.assert_allclose(np.asarray(res8.path),
                               np.asarray(res1.path), atol=1e-10)
    np.testing.assert_allclose(np.asarray(res8.energies),
                               np.asarray(res1.energies), atol=1e-10)
