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
        path_ref, fire, energies_ref, _, fmax_ref = step1(
            path_ref, fire, jnp.asarray(it))

    # sharded step over an 8-device CPU mesh
    mesh = ensemble_mesh(8, axis="batch")
    state = shard_batch(neb_init(path0, z, calc, config), mesh)
    step8 = jax.jit(neb_sharded_step(calc, z, config, mesh))
    for _ in range(20):
        state = step8(state)
        state.fmax.block_until_ready()   # serialize dispatches: pile-up
        # starves the 8-thread CPU collective rendezvous (40 s timeout)

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


def test_sharded_full_trajectory_parity_ci_on():
    """VERDICT round-3 item 7: >= 50-step climbing-image-on trajectory must
    match the single-device band to 1e-10, including the CI index CHANGING
    across shard boundaries mid-run (an image is started high so it relaxes
    below the true barrier image within a few iterations)."""
    path0, z = _setup()
    # spike image 3: initially the energy max, relaxes fast -> CI flips
    path0 = path0.at[3].add(0.35)
    calc = LennardJones()
    config = NEBConfig(variant="cineb", optimizer="fire", climbing_start=3,
                       n_steps=60)

    step1 = jax.jit(make_neb_step(calc, z, config))
    fire = fire_init(path0.size, path0.dtype, dt0=config.dt0)
    path_ref = path0
    ci_seen = set()
    for it in range(1, 61):
        path_ref, fire, e_ref, _, fmax_ref = step1(
            path_ref, fire, jnp.asarray(it))
        e_np = np.asarray(e_ref)
        ci_seen.add(int(np.argmax(e_np[1:-1])) + 1)

    mesh = ensemble_mesh(8, axis="batch")
    state = shard_batch(neb_init(path0, z, calc, config), mesh)
    step8 = jax.jit(neb_sharded_step(calc, z, config, mesh))
    for _ in range(60):
        state = step8(state)
        state.fmax.block_until_ready()

    np.testing.assert_allclose(np.asarray(state.coords),
                               np.asarray(path_ref), atol=1e-10)
    np.testing.assert_allclose(float(state.fmax), float(fmax_ref),
                               atol=1e-12)
    # the fixture must actually exercise a moving climbing image
    assert len(ci_seen) >= 2, f"CI never moved: {ci_seen}"


def test_sharded_bneb_matches_single_device():
    """bneb (Wilson-B per-atom tangents) sharded == single-device
    (ref: MEP/pathopt_bneb_force.py:21)."""
    path0, z = _setup()
    calc = LennardJones()
    config = NEBConfig(variant="bneb", optimizer="fire", n_steps=25)

    step1 = jax.jit(make_neb_step(calc, z, config))
    fire = fire_init(path0.size, path0.dtype, dt0=config.dt0)
    path_ref = path0
    for it in range(1, 26):
        path_ref, fire, e_ref, _, fmax_ref = step1(
            path_ref, fire, jnp.asarray(it))

    mesh = ensemble_mesh(8, axis="batch")
    state = shard_batch(neb_init(path0, z, calc, config), mesh)
    step8 = jax.jit(neb_sharded_step(calc, z, config, mesh))
    for _ in range(25):
        state = step8(state)
        state.fmax.block_until_ready()

    np.testing.assert_allclose(np.asarray(state.coords),
                               np.asarray(path_ref), atol=1e-10)
    np.testing.assert_allclose(float(state.fmax), float(fmax_ref),
                               atol=1e-12)


def test_sharded_lbfgs_matches_single_device():
    """Sharded global L-BFGS clock == the single-program lbfgs band clock
    (same circular buffer/admit/gamma math; dots are psum'd and the
    history is sharded along the image axis). Parity is checked over a
    SHORT horizon: psum reduction order differs from jnp.dot at the last
    bit, and L-BFGS curvature estimates on the non-conservative NEB force
    amplify 1e-14 noise chaotically after ~10 iterations — the per-step
    math is identical (1e-9 over 8 steps), the long-horizon trajectories
    are equally valid relaxations."""
    from multioptpy_tpu.steppers.first_order import lbfgs_init

    path0, z = _setup()
    calc = LennardJones()
    config = NEBConfig(variant="neb", optimizer="lbfgs", n_steps=8,
                       sd_step=0.5, max_move=0.3)

    step1 = jax.jit(make_neb_step(calc, z, config))
    lb = lbfgs_init(path0.size, dtype=path0.dtype)
    path_ref = path0
    for it in range(1, 9):
        path_ref, lb, e_ref, _, fmax_ref = step1(
            path_ref, lb, jnp.asarray(it))

    mesh = ensemble_mesh(8, axis="batch")
    state = shard_batch(neb_init(path0, z, calc, config), mesh)
    step8 = jax.jit(neb_sharded_step(calc, z, config, mesh))
    for _ in range(8):
        state = step8(state)
        state.fmax.block_until_ready()

    np.testing.assert_allclose(np.asarray(state.coords),
                               np.asarray(path_ref), atol=1e-9)
    np.testing.assert_allclose(float(state.fmax), float(fmax_ref),
                               atol=1e-10)


import pytest


@pytest.mark.parametrize("variant", ["qsm2", "ewbneb", "dmf", "om"])
def test_sharded_gather_variants_match_single_device(variant):
    """Gather-path sharded variants (whole-path force laws evaluated on
    the all_gathered band) must match the single-device step exactly —
    parity is by construction (same neb_forces dispatch), this pins the
    slicing/clock plumbing."""
    path0, z = _setup()
    calc = LennardJones()
    config = NEBConfig(variant=variant, optimizer="fire", n_steps=10)

    step1 = jax.jit(make_neb_step(calc, z, config))
    fire = fire_init(path0.size, path0.dtype, dt0=config.dt0)
    path_ref = path0
    for it in range(1, 11):
        path_ref, fire, _, _, _ = step1(path_ref, fire, jnp.asarray(it))

    mesh = ensemble_mesh(8, axis="batch")
    state = shard_batch(neb_init(path0, z, calc, config), mesh)
    step8 = jax.jit(neb_sharded_step(calc, z, config, mesh))
    for _ in range(10):
        state = step8(state)
        state.fmax.block_until_ready()

    np.testing.assert_allclose(np.asarray(state.coords),
                               np.asarray(path_ref), atol=1e-10)
