"""Molecular dynamics: velocity Verlet, Nose-Hoover (chain), Langevin BAOAB.

TPU-native redesign of the reference MD stack (ref: multioptpy/
moleculardynamics.py:21 driver, :121 exec_md dispatch, MD/thermostat.py:5):
one jitted `lax.scan` advances the whole trajectory on device; the
thermostat is part of the scan carry. Bias potentials compose exactly as in
optimization. Units: a.u. throughout (dt converted from fs).
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.geometry import masses_from_z
from multioptpy_tpu.units import AU2FS, KB_HARTREE

AMU2AU = 1.66053906660e-27 / 9.1093837015e-31


@dataclasses.dataclass(frozen=True)
class MDConfig:
    """defaults mirror ref: interface.py:341 mdparser."""

    timestep_fs: float = 0.5
    n_steps: int = 1000
    temperature: float = 300.0       # K
    thermostat: str = "nosehoover"   # none | nosehoover | nosehooverchain
                                     # | langevin | berendsen
    tau_fs: float = 50.0             # thermostat time constant
    friction_fs: float = 0.01        # Langevin gamma (1/fs)
    seed: int = 0
    n_chain: int = 3                 # Nose-Hoover chain length
    remove_com: bool = True
    # orthorhombic periodic box lengths [a b c] in Angstrom (ref: -pbc
    # interface.py:376; Utils/pbc.py molecule-preserving COM wrap)
    pbc_box_ang: tuple = ()


class MDState(NamedTuple):
    coords: jnp.ndarray     # (N,3) Bohr
    velocities: jnp.ndarray  # (N,3) Bohr / a.u. time
    energy: jnp.ndarray
    gradient: jnp.ndarray
    xi: jnp.ndarray         # thermostat chain velocities (n_chain,)
    key: jnp.ndarray


def kinetic_energy(v, masses_au):
    """ref: MD/thermostat.py:97."""
    return 0.5 * jnp.sum(masses_au[:, None] * v * v)


def instantaneous_temperature(v, masses_au):
    """T = 2 KE / (dof k_B) (ref: MD/thermostat.py:107)."""
    dof = v.size - 3
    return 2.0 * kinetic_energy(v, masses_au) / (dof * KB_HARTREE)


def maxwell_boltzmann(key, masses_au, temperature, dtype=jnp.float64):
    n = masses_au.shape[0]
    sigma = jnp.sqrt(KB_HARTREE * temperature / masses_au)[:, None]
    v = sigma * jax.random.normal(key, (n, 3), dtype=dtype)
    return v


def make_fragment_pbc_wrap(coords0, z, box_ang):
    """Molecule-preserving periodic wrap (ref: Utils/pbc.py:6
    apply_periodic_boundary_condition): whole covalent fragments translate
    so each center of mass lands inside the orthorhombic box. The
    reference re-derives fragments on host every step; here membership is
    fixed from the t=0 bond connectivity and the wrap is two matmuls that
    jit inside the MD scan. Returns coords -> coords."""
    from multioptpy_tpu.coords.internals import _components
    from multioptpy_tpu.geometry import bond_connectivity
    from multioptpy_tpu.units import ANGSTROM2BOHR

    coords0 = jnp.asarray(coords0)
    z_np = np.asarray(z)
    adj = np.asarray(bond_connectivity(coords0, jnp.asarray(z)))
    labels = _components(adj)
    frag_ids = sorted(set(labels))
    n = len(z_np)
    member = np.zeros((len(frag_ids), n))
    for fi, lab in enumerate(frag_ids):
        member[fi, [i for i in range(n) if labels[i] == lab]] = 1.0
    m = masses_from_z(np.asarray(z_np))
    com_w = member * np.asarray(m)[None, :]
    com_w = com_w / com_w.sum(axis=1, keepdims=True)
    dtype = coords0.dtype
    member_j = jnp.asarray(member, dtype)
    com_w_j = jnp.asarray(com_w, dtype)
    box = jnp.asarray(np.asarray(box_ang, dtype=np.float64)
                      * ANGSTROM2BOHR, dtype)

    def wrap(x):
        com = com_w_j @ x                        # (F,3)
        shift = -jnp.floor(com / box) * box      # translate into [0, box)
        return x + member_j.T @ shift

    return wrap


def make_md_step(calc, z, config=MDConfig(), bias_engine=None,
                 constraints=None, constraint_targets=None,
                 pbc_wrap=None):
    dt = config.timestep_fs / AU2FS
    masses = None  # resolved lazily from z inside (traced gather)
    kT = KB_HARTREE * config.temperature
    tau = config.tau_fs / AU2FS
    gamma = config.friction_fs * AU2FS  # 1/fs -> 1/a.u.

    def energy_grad(coords):
        e, g = calc.energy_and_gradient(coords, z)
        if bias_engine is not None and len(bias_engine):
            be, bg = bias_engine.energy_and_gradient(coords)
            e, g = e + be, g + bg
        return e, g

    def step(state):
        m = (masses_from_z(jnp.asarray(z)) * AMU2AU).astype(state.coords.dtype)
        dof = state.velocities.size - 3
        v = state.velocities
        x = state.coords
        f = -state.gradient
        key = state.key
        xi = state.xi

        if config.thermostat == "langevin":
            # BAOAB splitting (Leimkuhler-Matthews)
            # ref: moleculardynamics.py:127-139 langevin(baoab)
            key, sub = jax.random.split(key)
            v = v + 0.5 * dt * f / m[:, None]
            x = x + 0.5 * dt * v
            c1 = jnp.exp(-gamma * dt)
            c2 = jnp.sqrt((1.0 - c1 * c1) * kT / m)[:, None]
            v = c1 * v + c2 * jax.random.normal(sub, v.shape, dtype=v.dtype)
            x = x + 0.5 * dt * v
            e, g = energy_grad(x)
            v = v + 0.5 * dt * (-g) / m[:, None]
        else:
            if config.thermostat in ("nosehoover", "nosehooverchain"):
                # half-step thermostat scaling (ref: MD/thermostat.py:117,:150)
                n_c = config.n_chain if config.thermostat == "nosehooverchain" else 1
                q = jnp.full((xi.shape[0],), dof * kT * tau * tau,
                             dtype=v.dtype)
                q = q.at[1:].set(kT * tau * tau)

                def chain_update(v, xi):
                    ke = kinetic_energy(v, m)
                    g1 = (2.0 * ke - dof * kT) / q[0]
                    xi = xi.at[0].add(0.5 * dt * g1)
                    for j in range(1, n_c):
                        gj = (q[j - 1] * xi[j - 1] ** 2 - kT) / q[j]
                        xi = xi.at[j].add(0.5 * dt * gj)
                    v = v * jnp.exp(-dt * xi[0])
                    return v, xi

                v, xi = chain_update(v, xi)
            elif config.thermostat == "berendsen":
                t_now = instantaneous_temperature(v, m)
                lam = jnp.sqrt(jnp.maximum(
                    1.0 + dt / tau * (config.temperature /
                                      jnp.maximum(t_now, 1.0) - 1.0), 0.0))
                v = v * lam

            # velocity Verlet (ref: MD/thermostat.py Velocity_Verlet)
            v = v + 0.5 * dt * f / m[:, None]
            x = x + dt * v
            e, g = energy_grad(x)
            v = v + 0.5 * dt * (-g) / m[:, None]

            if config.thermostat in ("nosehoover", "nosehooverchain"):
                v, xi = chain_update(v, xi)

        if constraints is not None and constraint_targets is not None:
            # SHAKE positions back onto the constraint manifold, RATTLE-style
            # velocity correction (ref: moleculardynamics.py:142-145 SHAKE)
            x_shaken = constraints.shake(x, constraint_targets)
            v = v + (x_shaken - x) / dt
            x = x_shaken
            e, g = energy_grad(x)

        if config.remove_com:
            p = jnp.sum(m[:, None] * v, axis=0)
            v = v - p[None, :] / jnp.sum(m)

        if pbc_wrap is not None:
            # per-fragment COM wrap into the box (ref:
            # moleculardynamics.py:156)
            x = pbc_wrap(x)

        return MDState(coords=x, velocities=v, energy=e, gradient=g,
                       xi=xi, key=key)

    return step


class MDResult(NamedTuple):
    trajectory: np.ndarray      # (S,N,3)
    energies: np.ndarray        # potential
    temperatures: np.ndarray
    final: MDState


def run_md(calc, coords, z, config=MDConfig(), bias_engine=None,
           velocities=None, record_every=1, constraints=None):
    """NVE/NVT trajectory entirely on device (3.x md stack,
    ref: moleculardynamics.py:164 loop :281)."""
    coords = jnp.asarray(coords)
    z = jnp.asarray(z)
    m = (masses_from_z(z) * AMU2AU).astype(coords.dtype)
    key = jax.random.PRNGKey(config.seed)
    if velocities is None:
        key, sub = jax.random.split(key)
        velocities = maxwell_boltzmann(sub, m, config.temperature,
                                       coords.dtype)
    e0, g0 = calc.energy_and_gradient(coords, z)
    if bias_engine is not None and len(bias_engine):
        be, bg = bias_engine.energy_and_gradient(coords)
        e0, g0 = e0 + be, g0 + bg

    constraint_targets = None
    if constraints is not None and constraints.n_constraints:
        if constraints.n_atoms is None:
            constraints.n_atoms = coords.shape[0]
        constraint_targets = constraints.targets(coords)
        coords = constraints.shake(coords, constraint_targets)

    n_chain = config.n_chain if config.thermostat == "nosehooverchain" else 1
    state0 = MDState(coords=coords, velocities=velocities, energy=e0,
                     gradient=g0,
                     xi=jnp.zeros((n_chain,), coords.dtype), key=key)
    pbc_wrap = None
    if config.pbc_box_ang:
        pbc_wrap = make_fragment_pbc_wrap(coords, z, config.pbc_box_ang)
    step = make_md_step(calc, z, config, bias_engine, constraints,
                        constraint_targets, pbc_wrap=pbc_wrap)

    @jax.jit
    def run(state):
        def body(s, _):
            s = step(s)
            t = instantaneous_temperature(s.velocities, m)
            return s, (s.coords, s.energy, t)

        final, (traj, es, ts) = jax.lax.scan(
            body, state, None, length=config.n_steps)
        return final, traj, es, ts

    final, traj, es, ts = run(state0)
    sl = slice(None, None, record_every)
    return MDResult(trajectory=np.asarray(traj[sl]),
                    energies=np.asarray(es[sl]),
                    temperatures=np.asarray(ts[sl]), final=final)
