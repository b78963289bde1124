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
