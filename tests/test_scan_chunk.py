"""Chunked-scan drivers == per-step host loops, step for step.

`OptimizeConfig.scan_chunk` / `NEBConfig.scan_chunk` run K steps per
device dispatch through the SAME compiled step function the host loop
jits, so the trajectories must agree to machine precision — the only
intended differences are host-visibility cadence (guards/callbacks fire
at chunk boundaries) and the runaway semantics (chunked keeps the last
finite state instead of the post-runaway one).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators import get_calculator
from multioptpy_tpu.drivers.neb import NEBConfig, interpolate_linear, neb
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize


def _ar8():
    rng = np.random.default_rng(7)
    base = np.array([[0, 0, 0], [1.1, 0, 0], [0, 1.1, 0], [0, 0, 1.1],
                     [1.1, 1.1, 0], [1.1, 0, 1.1], [0, 1.1, 1.1],
                     [1.1, 1.1, 1.1]]) * 6.0
    return jnp.asarray(base + rng.normal(scale=0.3, size=base.shape))


def test_optimize_chunked_matches_host_loop():
    calc = get_calculator("lj")
    z = jnp.full(8, 18)
    coords = _ar8()
    base = OptimizeConfig(method="rfo_fsb", nsteps=40)
    r_host = optimize(calc, coords, z, config=base)
    r_chunk = optimize(calc, coords, z,
                       config=dataclasses.replace(base, scan_chunk=7))
    np.testing.assert_allclose(np.asarray(r_chunk.coords),
                               np.asarray(r_host.coords), atol=1e-10)
    assert bool(r_chunk.converged) == bool(r_host.converged)
    # energy histories agree over the shared prefix (chunked may carry a
    # few frozen post-convergence entries within the final chunk)
    n = min(len(r_host.energy_history), len(r_chunk.energy_history))
    np.testing.assert_allclose(r_chunk.energy_history[:n],
                               r_host.energy_history[:n], atol=1e-10)


def test_optimize_chunked_trajectory_recorded():
    calc = get_calculator("lj")
    z = jnp.full(8, 18)
    cfg = OptimizeConfig(method="fire", nsteps=10, scan_chunk=4)
    res = optimize(calc, _ar8(), z, config=cfg, record_trajectory=True)
    assert res.coords_history is not None
    assert res.coords_history.shape[0] == len(res.energy_history)
    np.testing.assert_allclose(res.coords_history[-1],
                               np.asarray(res.coords), atol=1e-12)


def test_neb_chunked_matches_host_loop():
    calc = get_calculator("lj")
    z = jnp.full(3, 18)
    a = jnp.asarray(np.array([[0, 0, 0], [6.8, 0, 0], [13.6, 0, 0.0]]))
    b = jnp.asarray(np.array([[0, 0, 0], [6.8, 1.5, 0], [13.6, 0, 0.0]]))
    path0 = interpolate_linear(a, b, 7)
    base = NEBConfig(variant="cineb", n_steps=25, climbing_start=5)
    r_host = neb(calc, path0, z, base)
    r_chunk = neb(calc, path0, z, dataclasses.replace(base, scan_chunk=6))
    np.testing.assert_allclose(np.asarray(r_chunk.path),
                               np.asarray(r_host.path), atol=1e-10)
    np.testing.assert_allclose(np.asarray(r_chunk.energies),
                               np.asarray(r_host.energies), atol=1e-10)


def test_neb_chunked_redistribution_boundaries():
    # segment cutting must land host redistribution on the same
    # iterations the per-step loop uses (every 4, here with chunk 6)
    calc = get_calculator("lj")
    z = jnp.full(3, 18)
    a = jnp.asarray(np.array([[0, 0, 0], [6.8, 0, 0], [13.6, 0, 0.0]]))
    b = jnp.asarray(np.array([[0, 0, 0], [6.8, 1.5, 0], [13.6, 0, 0.0]]))
    path0 = interpolate_linear(a, b, 7)
    base = NEBConfig(variant="neb", n_steps=13, redistribute="linear",
                     redistribute_every=4, fmax=1e-9)
    r_host = neb(calc, path0, z, base)
    r_chunk = neb(calc, path0, z, dataclasses.replace(base, scan_chunk=6))
    np.testing.assert_allclose(np.asarray(r_chunk.path),
                               np.asarray(r_host.path), atol=1e-10)
    assert r_chunk.n_iterations == r_host.n_iterations
