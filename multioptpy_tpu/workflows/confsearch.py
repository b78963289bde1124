"""Conformer search — batched AFIR-kick exploration.

ref: multioptpy/Entrypoints/conformation_search.py:13 (783 LoC): the
reference optimizes ONE perturbed conformer at a time — pick a seed by
(tabu-)Boltzmann weighting (:382-397), push a random atom pair with an AFIR
bias of strength base_force, re-optimize, deduplicate by sorted-distance-
matrix comparison (:83-112), loop `max_samples` times (:569).

TPU-native redesign: every round generates a whole BATCH of candidates
(random pairs, push/pull signs), runs a short vmapped FIRE relaxation on the
biased surface (the AFIR pair enters through one-hot weight vectors so the
same compiled program serves every member), then relaxes the batch on the
unbiased surface in lockstep with `optimize_batch`. Deduplication and
Boltzmann bookkeeping stay on host (cheap, O(found^2)).
"""

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize_batch
from multioptpy_tpu.geometry import bond_connectivity
from multioptpy_tpu.potentials.afir import afir_alpha
from multioptpy_tpu.units import KB_HARTREE


@dataclasses.dataclass(frozen=True)
class ConfSearchConfig:
    n_rounds: int = 8
    batch_size: int = 16
    base_gamma: float = 200.0       # kJ/mol AFIR push strength (ref: -bf)
    kick_steps: int = 60            # biased FIRE steps
    relax_steps: int = 80           # unbiased batched opt steps
    opt: OptimizeConfig = dataclasses.field(
        default_factory=lambda: OptimizeConfig(method="rfo_fsb"))
    temperature: float = 300.0      # Boltzmann seed selection
    dedupe_threshold: float = 0.1   # Bohr, sorted-distance-matrix metric
    preserve_bonds: bool = True     # reject connectivity changes (ref: :129)
    seed: int = 0
    tabu_weight: float = 1.0        # visit-count penalty (ref: :34)
    # AFIR pairs drawn only among these 1-indexed atoms (ref: -tgta
    # :209,:477 target_atoms)
    target_atoms: Optional[Sequence[int]] = None
    # False = always kick from the initial EQ instead of (tabu-)Boltzmann
    # seed switching (ref: -nost no_stochastic :698)
    stochastic: bool = True
    # termination: stop once the lowest-`number_of_rank` energy list has
    # not changed for `number_of_lowest` consecutive rounds (ref: -nr/-nl
    # :675-686; only active while more than number_of_rank conformers
    # exist, as in the reference)
    number_of_rank: int = 10
    number_of_lowest: int = 5


class ConfSearchResult(NamedTuple):
    conformers: np.ndarray       # (C,N,3) unique, energy-sorted
    energies: np.ndarray         # (C,)
    n_generated: int
    n_rejected_bonds: int


def _sorted_distance_fingerprint(coords):
    n = coords.shape[0]
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    return np.sort(d[np.triu_indices(n, 1)])


def _is_duplicate(fp, fps, thresh):
    for other in fps:
        if np.max(np.abs(fp - other)) < thresh:
            return True
    return False


def make_kick_relax(calc, z, gamma, n_steps):
    """Vmapped FIRE relaxation on E + AFIR(pair) where the pair is encoded
    as one-hot weights (traced), so one compiled program covers every
    random pair in the batch."""

    def biased_energy(coords, w1, w2, sign):
        e = calc.energy(coords, z)
        c1 = w1 @ coords
        c2 = w2 @ coords
        r = jnp.sqrt(jnp.sum((c1 - c2) ** 2) + 1e-12)
        return e + sign * afir_alpha(jnp.asarray(gamma, coords.dtype)) * r

    grad = jax.grad(biased_energy)

    @jax.jit
    def run(coords_b, w1_b, w2_b, sign_b):
        def one(coords, w1, w2, sign):
            def body(carry, _):
                x, v, dt = carry
                g = grad(x, w1, w2, sign)
                power = jnp.sum(-g * v)
                v = jnp.where(power > 0, 0.9 * v - dt * g, -dt * g)
                dtn = jnp.where(power > 0, jnp.minimum(dt * 1.05, 0.8), dt * 0.5)
                return (x + dtn * v, v, dtn), None

            (x, _, _), _ = jax.lax.scan(
                body, (coords, jnp.zeros_like(coords),
                       jnp.asarray(0.1, coords.dtype)), None, length=n_steps)
            return x

        return jax.vmap(one)(coords_b, w1_b, w2_b, sign_b)

    return run


def save_search_state(path, found, energies, visits):
    """Restart file (ref: conformation_search.py:439-476 EQ_energy.dat /
    visit_counts.dat — one npz here)."""
    np.savez(path, conformers=np.stack(found),
             energies=np.asarray(energies), visits=np.asarray(visits))


def load_search_state(path):
    data = np.load(path)
    return (list(data["conformers"]), list(data["energies"].astype(float)),
            list(data["visits"].astype(int)))


def conformer_search(calc, coords, z, config=ConfSearchConfig(),
                     restart_file=None, mesh=None):
    """Explore the conformer ensemble of one molecule (3.5-equivalent).
    `restart_file`: npz path — loaded if it exists, written after every
    round, so interrupted searches resume (ref: conformation_search.py
    restartability).

    `mesh`: optional 1-D jax.sharding.Mesh — every batched stage (AFIR
    kick, unbiased relaxation) runs with its batch axis split across the
    mesh devices (SURVEY §5.8 workload 1: conformer ensembles over ICI;
    the reference explores sequentially, conformation_search.py:569)."""
    import os

    rng = np.random.default_rng(config.seed)
    coords = jnp.asarray(coords)
    z = jnp.asarray(z)
    n = coords.shape[0]
    dtype = coords.dtype

    if restart_file and os.path.exists(restart_file):
        found, energies, visits = load_search_state(restart_file)
        seed_coords = found[0]
    else:
        # seed conformer: relax the input
        seed_res = optimize_batch(calc, coords[None], z, config=config.opt,
                                  n_steps=config.relax_steps)
        seed_coords = np.asarray(seed_res.coords[0])
        seed_energy = float(seed_res.energy[0])
        found = [seed_coords]
        energies = [seed_energy]
        visits = [0]

    ref_bonds = np.asarray(bond_connectivity(jnp.asarray(seed_coords), z))
    fps = [_sorted_distance_fingerprint(c) for c in found]
    n_rejected = 0

    kick = make_kick_relax(calc, z, config.base_gamma, config.kick_steps)
    kT = KB_HARTREE * config.temperature

    # AFIR pairs drawn from target atoms only (ref: :477 target_atoms,
    # :339 make_tgt_atom_pair)
    if config.target_atoms:
        pool = np.asarray(sorted({int(a) - 1 for a in config.target_atoms}))
        if len(pool) < 2:
            raise ValueError("target_atoms needs at least 2 atoms")
    else:
        pool = np.arange(n)

    prev_rank = None
    no_update = 0
    n_rounds_run = 0
    for _ in range(config.n_rounds):
        n_rounds_run += 1
        if config.stochastic:
            # Boltzmann + tabu seed selection (ref: :382)
            e_arr = np.asarray(energies)
            w = np.exp(-(e_arr - e_arr.min()) / max(kT, 1e-12)
                       - config.tabu_weight * np.asarray(visits))
            w = w / w.sum()
            seeds_idx = rng.choice(len(found), size=config.batch_size, p=w)
        else:
            # no EQ switching: every kick starts from the initial EQ
            # (ref: :698 no_stochastic -> idx = 0)
            seeds_idx = np.zeros(config.batch_size, dtype=int)
        for i in seeds_idx:
            visits[i] += 1

        batch = np.stack([found[i] for i in seeds_idx])
        # random atom pairs + push/pull
        pairs = np.stack([rng.choice(pool, size=2, replace=False)
                          for _ in range(config.batch_size)])
        w1 = np.zeros((config.batch_size, n))
        w2 = np.zeros((config.batch_size, n))
        w1[np.arange(config.batch_size), pairs[:, 0]] = 1.0
        w2[np.arange(config.batch_size), pairs[:, 1]] = 1.0
        signs = rng.choice([-1.0, 1.0], size=config.batch_size)

        kick_in = (jnp.asarray(batch, dtype), jnp.asarray(w1, dtype),
                   jnp.asarray(w2, dtype), jnp.asarray(signs, dtype))
        if mesh is not None:
            from multioptpy_tpu.parallel.mesh import shard_batch
            kick_in = shard_batch(kick_in, mesh, mesh.axis_names[0])
        kicked = kick(*kick_in)

        relaxed = optimize_batch(calc, kicked, z, config=config.opt,
                                 n_steps=config.relax_steps, mesh=mesh)
        coords_b = np.asarray(relaxed.coords)
        e_b = np.asarray(relaxed.energy)

        for cand, e in zip(coords_b, e_b):
            if not np.all(np.isfinite(cand)):
                continue
            if config.preserve_bonds:
                bonds = np.asarray(bond_connectivity(jnp.asarray(cand), z))
                if not np.array_equal(bonds, ref_bonds):
                    n_rejected += 1
                    continue
            fp = _sorted_distance_fingerprint(cand)
            if _is_duplicate(fp, fps, config.dedupe_threshold):
                continue
            found.append(cand)
            energies.append(float(e))
            fps.append(fp)
            visits.append(0)
        if restart_file:
            save_search_state(restart_file, found, energies, visits)

        # termination: lowest-`number_of_rank` list stable for
        # `number_of_lowest` rounds (ref: :675-686)
        if len(energies) > config.number_of_rank:
            rank = np.sort(np.asarray(energies))[:config.number_of_rank]
            if prev_rank is not None and len(prev_rank) == len(rank) \
                    and np.allclose(rank, prev_rank, atol=0.0):
                no_update += 1
            else:
                no_update = 0
            prev_rank = rank
            if no_update > config.number_of_lowest:
                break

    order = np.argsort(energies)
    return ConfSearchResult(
        conformers=np.stack(found)[order],
        energies=np.asarray(energies)[order],
        n_generated=n_rounds_run * config.batch_size,
        n_rejected_bonds=n_rejected,
    )
