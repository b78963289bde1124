"""GPNEB — Gaussian-process-accelerated NEB.

ref: multioptpy/MEP/pathopt_gpneb_force.py:154 CaluculationGPNEB (RBF-kernel
GP with chunked K / grad-K / hess-K blocks :23-153; Koistinen et al., JCP
147 (2017) 152720): true energies/gradients are evaluated only once per
outer round; between evaluations the whole band relaxes on the GP surrogate
PES, cutting expensive backend calls by an order of magnitude.

Uses the gradient-enhanced GP posterior from steppers/gp.py. The surrogate
relaxation reuses the standard improved-tangent NEB force with surrogate
gradients (`jax.grad` of the posterior mean).
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.drivers.neb import neb_forces
from multioptpy_tpu.steppers.first_order import fire_init, fire_step
from multioptpy_tpu.steppers.gp import GpState, gp_posterior_energy


@dataclasses.dataclass(frozen=True)
class GPNEBConfig:
    n_outer: int = 6             # true-evaluation rounds
    n_inner: int = 60            # surrogate NEB steps per round
    k_spring: float = 0.01
    lengthscale: float = 1.0
    dt0: float = 0.1
    dt_max: float = 0.4
    fmax: float = 5e-4
    max_history: int = 96        # GP observation budget


class GPNEBResult(NamedTuple):
    path: jnp.ndarray
    energies: jnp.ndarray
    converged: bool
    n_true_evaluations: int
    ts_index: int


def gpneb(calc, path0, z, config=GPNEBConfig(), bias_engine=None,
          mesh=None, mesh_axis="batch"):
    """Run GP-accelerated NEB on an (I,N,3) initial path.

    `mesh`: optional 1-D jax.sharding.Mesh — the expensive part of GPNEB
    is the once-per-round TRUE evaluation fan-out over the band (the GP
    solve itself is tiny, ref: pathopt_gpneb_force.py:154); with a mesh
    the image axis is sharded over its devices for both the true
    evaluations and the surrogate relaxation (GSPMD partitions the
    vmapped evals; the NEB rolls become collective permutes). Image
    count must divide the mesh size.
    """
    path = jnp.asarray(path0)
    z = jnp.asarray(z)
    n_images, n_atoms, _ = path.shape
    d = n_atoms * 3
    dtype = path.dtype

    img_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        n_dev = int(mesh.shape[mesh_axis])
        if n_images % n_dev:
            raise ValueError(
                f"gpneb: {n_images} images not divisible over "
                f"{n_dev} devices")
        img_sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
        path = jax.device_put(path, img_sharding)

    def _true_eval_impl(p):
        def one(x):
            e, g = calc.energy_and_gradient(x, z)
            if bias_engine is not None and len(bias_engine):
                be, bg = bias_engine.energy_and_gradient(x)
                e, g = e + be, g + bg
            return e, g
        return jax.vmap(one)(p)

    if img_sharding is not None:
        true_eval = jax.jit(_true_eval_impl, in_shardings=img_sharding)
    else:
        true_eval = _true_eval_impl

    gp = GpState(jnp.zeros((config.max_history, d), dtype),
                 jnp.zeros((config.max_history,), dtype),
                 jnp.zeros((config.max_history, d), dtype),
                 jnp.asarray(0, jnp.int32))

    def gp_push(gp, p, es, gs):
        m = gp.x_hist.shape[0]
        for i in range(p.shape[0]):
            slot = gp.count % m
            gp = GpState(gp.x_hist.at[slot].set(p[i].reshape(-1)),
                         gp.e_hist.at[slot].set(es[i]),
                         gp.g_hist.at[slot].set(gs[i].reshape(-1)),
                         gp.count + 1)
        return gp

    surrogate_grad = jax.grad(
        lambda q, gp: gp_posterior_energy(q, gp, config.lengthscale),
        argnums=0)

    @jax.jit
    def surrogate_relax(path, gp):
        def body(carry, _):
            p, fire = carry
            es = jax.vmap(lambda x: gp_posterior_energy(
                x.reshape(-1), gp, config.lengthscale))(p)
            gs = jax.vmap(lambda x: surrogate_grad(
                x.reshape(-1), gp).reshape(n_atoms, 3))(p)
            forces = neb_forces(p, es, gs, config.k_spring, "neb")
            move, fire = fire_step(fire, -forces.reshape(-1),
                                   dt_max=config.dt_max)
            return (p + move.reshape(p.shape), fire), None

        fire = fire_init(path.size, dtype, dt0=config.dt0)
        (p, _), _ = jax.lax.scan(body, (path, fire), None,
                                 length=config.n_inner)
        return p

    n_true = 0
    converged = False
    energies = None
    for outer in range(config.n_outer):
        energies, grads = true_eval(path)
        n_true += n_images
        fmax = float(jnp.max(jnp.abs(neb_forces(
            path, energies, grads, config.k_spring, "neb"))))
        if fmax < config.fmax:
            converged = True
            break
        gp = gp_push(gp, path, energies, grads)
        path = surrogate_relax(path, gp)

    if energies is None:
        energies, _ = true_eval(path)
    e_np = np.asarray(energies)
    ts_index = int(np.argmax(e_np[1:-1])) + 1 if n_images > 2 else 0
    return GPNEBResult(path=path, energies=energies, converged=converged,
                       n_true_evaluations=n_true, ts_index=ts_index)
