"""Device-mesh sharding of structure ensembles over ICI.

The reference has no distributed execution at all — NEB images, conformers
and mapper tasks run in one sequential Python loop (SURVEY §2.7; e.g.
ref: Entrypoints/conformation_search.py:569). This module is the TPU-native
replacement: ensembles are a leading `batch` axis, `vmap` turns the per-
structure step into a batched step, and a 1-D `jax.sharding.Mesh` over the
`batch` axis splits members across chips. The work is embarrassingly
parallel (each structure's RFO step is independent), so sharding the batch
axis with `NamedSharding` and letting XLA partition the jitted program is
both the simplest and the fastest layout: zero collectives on the step path,
ICI traffic only at gather time. NEB adds the one true communication pattern
(±1 neighbor exchange) via `ppermute` in drivers/neb.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensemble_mesh(n_devices=None, axis="batch", devices=None):
    """1-D mesh over all (or the first n) local devices."""
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(tree, mesh, axis="batch"):
    """Place every leaf of a batched pytree with its leading axis split over
    the mesh. Leaves whose leading dim doesn't divide get replicated."""
    n = mesh.devices.size

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def sharded_optimize_batch(calc, coords_batch, z, mesh=None, bias_engine=None,
                           config=None, n_steps=50, axis="batch"):
    """Batched ensemble optimization sharded across a device mesh.

    coords_batch: (B, N, 3) with B divisible by the mesh size. Every device
    advances B/n_dev structures in lockstep; convergence masking freezes
    finished members (drivers/optimize.make_step_fn).
    """
    from multioptpy_tpu.drivers.optimize import (
        OptimizeConfig, init_state, make_step_fn)

    config = config or OptimizeConfig()
    mesh = mesh or ensemble_mesh(axis=axis)
    z = jnp.asarray(z)
    step = make_step_fn(calc, z, bias_engine, config)

    state0 = jax.vmap(lambda c: init_state(c, z, calc, bias_engine, config))(
        jnp.asarray(coords_batch))
    state0 = shard_batch(state0, mesh, axis)

    @jax.jit
    def run(state):
        def body(s, _):
            return jax.vmap(step)(s), None

        final, _ = jax.lax.scan(body, state, None, length=n_steps)
        return final

    final = run(state0)
    return final


def tp_energy_and_gradient(calc, coords, z, mesh=None, axis="tp"):
    """Tensor-parallel SQM energy+gradient for ONE large molecule.

    Complementary scaling axis to the ensemble batch: the calculator's
    O(N^2) pairwise builds (geometry differences, Gaussian overlap-block
    contractions, and by GSPMD propagation the EEQ / repulsion / dispersion
    pair matrices and their gradient transposes) are row-sharded over the
    mesh's `axis`; the dense (nob N)^2 eigensolve stays replicated. XLA
    inserts the all-gather at the eigh boundary and the psum in the
    gradient transpose automatically from the two internal
    `with_sharding_constraint`s (calculators/sqm.py `_tp_shard_rows`).
    The reference evaluates everything in one process (SURVEY §2.7), so
    this axis is new TPU-native capability, not a port.

    Returns (energy, gradient) computed under the mesh; the calculator's
    TP hook is reset afterwards so `calc` stays usable unsharded.
    """
    mesh = mesh or ensemble_mesh(axis=axis)
    zj = jnp.asarray(z)
    prev = (getattr(calc, "tp_mesh", None), getattr(calc, "tp_axis", "tp"))
    calc.tp_mesh, calc.tp_axis = mesh, axis
    try:
        fn = jax.jit(lambda c: calc.energy_and_gradient(c, zj))
        e, g = fn(jnp.asarray(coords))
        return jax.block_until_ready(e), jax.block_until_ready(g)
    finally:
        calc.tp_mesh, calc.tp_axis = prev
