"""Mapper parity machinery (ref: Wrapper/mapper.py:104-940): structure
checker, bond-topology checker, queues, explored-pairs log, perturbation
generator, and a short end-to-end map_network run."""

import os

import numpy as np
import pytest

from multioptpy_tpu.workflows.mapper import (
    BoltzmannQueue, BondTopologyChecker, ExplorationTask, ExploredPairsLog,
    PerturbationGenerator, RandomQueue, RCMCQueue, StructureChecker)


def _rot(axis, t):
    c, s = np.cos(t), np.sin(t)
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


WATER = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.81], [1.75, 0.0, -0.48]])
Z_WATER = np.array([8, 1, 1])


class TestStructureChecker:
    def test_identical_rotated_translated(self):
        sc = StructureChecker()
        moved = WATER @ _rot("z", 0.7).T @ _rot("x", 1.1).T + 3.0
        assert sc.are_similar(Z_WATER, WATER, Z_WATER, moved)
        assert sc.compute_rmsd(Z_WATER, WATER, Z_WATER, moved) < 1e-8

    def test_atom_permutation_invariance(self):
        sc = StructureChecker()
        permuted = WATER[[0, 2, 1]]   # swap the two H
        assert sc.are_similar(Z_WATER, WATER, Z_WATER, permuted)

    def test_different_geometry_not_similar(self):
        sc = StructureChecker()
        stretched = WATER.copy()
        stretched[1, 2] += 1.5
        assert not sc.are_similar(Z_WATER, WATER, Z_WATER, stretched)

    def test_different_composition_inf(self):
        sc = StructureChecker()
        assert sc.compute_rmsd(Z_WATER, WATER, np.array([7, 1, 1]),
                               WATER) == float("inf")

    def test_enantiomers_not_equated(self):
        """PCA det=+1 correction must not reflect a chiral structure
        (ref: mapper.py:219-223)."""
        sc = StructureChecker(rmsd_threshold_ang=0.1)
        chiral = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0],
                           [0.0, 2.3, 0.0], [0.0, 0.0, 2.7],
                           [-1.5, -1.4, -1.6]])
        z = np.array([6, 1, 9, 17, 35])
        mirror = chiral * np.array([1.0, 1.0, -1.0])
        assert sc.compute_rmsd(z, chiral, z, mirror) > 0.2

    def test_linear_molecule_degenerate_axes(self):
        """A linear molecule has degenerate PCA eigenvalues; the rotation
        grid must still match arbitrary rotations around the axis."""
        sc = StructureChecker()
        co2 = np.array([[0.0, 0.0, -2.2], [0.0, 0.0, 0.0], [0.0, 0.0, 2.2]])
        z = np.array([8, 6, 8])
        rotated = co2 @ _rot("z", 1.234).T @ _rot("x", 0.456).T
        assert sc.are_similar(z, co2, z, rotated)


class TestBondTopology:
    def test_fingerprint_counts(self):
        bt = BondTopologyChecker()
        fp = bt.fingerprint(Z_WATER, WATER)
        assert fp == {(1, 8): 2}

    def test_conformer_keeps_fingerprint(self):
        bt = BondTopologyChecker()
        bent = WATER @ _rot("z", 0.4).T
        assert not bt.has_rearrangement(Z_WATER, WATER, Z_WATER, bent)

    def test_dissociation_changes_fingerprint(self):
        bt = BondTopologyChecker()
        dissoc = WATER.copy()
        dissoc[2] *= 4.0
        assert bt.has_rearrangement(Z_WATER, WATER, Z_WATER, dissoc)


class TestQueues:
    def _task(self, node, de, pair=(0, 1), gamma=100.0):
        return ExplorationTask(node_id=node, pair=pair, gamma=gamma,
                               metadata={"delta_E_hartree": de,
                                         "source_node_energy": de})

    def test_boltzmann_priority_ordering(self):
        q = BoltzmannQueue(temperature_k=300.0)
        q.push(self._task(0, 0.05, pair=(0, 1)))    # ~0 priority
        q.push(self._task(1, 0.0, pair=(0, 2)))     # priority 1
        q.push(self._task(2, 0.001, pair=(0, 3)))   # in between
        order = [q.pop().node_id for _ in range(3)]
        assert order == [1, 2, 0]

    def test_boltzmann_priority_value(self):
        from multioptpy_tpu.units import KB_HARTREE
        q = BoltzmannQueue(temperature_k=300.0)
        de = 0.002
        p = q.compute_priority(self._task(0, de))
        assert p == pytest.approx(np.exp(-de / (KB_HARTREE * 300.0)))

    def test_duplicate_suppression(self):
        q = BoltzmannQueue()
        assert q.push(self._task(0, 0.0, pair=(0, 1)))
        assert not q.push(self._task(0, 0.0, pair=(0, 1)))
        assert len(q) == 1

    def test_refresh_priorities(self):
        q = BoltzmannQueue(temperature_k=300.0)
        q.push(self._task(0, 0.05))
        # reference energy drops: task's source energy 0.05 now sits 0.05
        # above ref 0.0 still; with ref -0.05 it is 0.1 above -> lower prio
        p_before = q._tasks[0].priority
        q.refresh_priorities(-0.05)
        assert q._tasks[0].priority < p_before

    def test_random_and_rcmc_construct(self):
        RandomQueue(rng_seed=1)
        RCMCQueue(rng_seed=1)


def test_explored_pairs_log_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "explored.log")
    log = ExploredPairsLog(path)
    log.record(0, 1, 2, "+")
    log.record(3, 4, 5, "-")
    log.record(0, 1, 2, "+")   # duplicate, no double write
    assert len(log) == 2
    log2 = ExploredPairsLog(path)
    assert log2.has(0, 1, 2, "+")
    assert log2.has(3, 4, 5, "-")
    assert not log2.has(0, 1, 2, "-")
    assert len(log2) == 2


class TestPerturbationGenerator:
    def test_covalent_pairs_excluded(self):
        gen = PerturbationGenerator(dist_lower_ang=0.3, dist_upper_ang=9.0)
        pairs = gen.candidate_pairs(Z_WATER, WATER)
        # O-H bonds excluded; H..H (2.9 Bohr = 1.55 Ang) allowed
        assert (1, 2) in pairs
        assert (0, 1) not in pairs and (0, 2) not in pairs

    def test_distance_window(self):
        gen = PerturbationGenerator(dist_lower_ang=2.0, dist_upper_ang=9.0)
        assert gen.candidate_pairs(Z_WATER, WATER) == []

    def test_negative_gamma_duplicates(self):
        gen = PerturbationGenerator(dist_lower_ang=0.3, dist_upper_ang=9.0,
                                    include_negative_gamma=True, max_pairs=1)
        out = gen.generate(Z_WATER, WATER)
        assert len(out) == 2
        assert out[0][1] == -out[1][1]

    def test_active_atoms_restriction(self):
        gen = PerturbationGenerator(dist_lower_ang=0.3, dist_upper_ang=9.0,
                                    active_atoms=[1, 2])
        assert gen.candidate_pairs(Z_WATER, WATER) == []


def test_map_network_lj_end_to_end(tmp_path):
    """Short exploration on an LJ cluster: runs, persists, restarts, and
    never duplicates a node for re-found minima."""
    import jax.numpy as jnp
    from multioptpy_tpu.calculators.lj import LennardJones
    from multioptpy_tpu.drivers.irc import IRCConfig
    from multioptpy_tpu.drivers.neb import NEBConfig
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    from multioptpy_tpu.workflows.autots import AutoTSConfig
    from multioptpy_tpu.workflows.mapper import MapperConfig, map_network

    r = 7.1
    coords = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [r, 0.0, 0.0], [r / 2, r * 0.9, 0.0]]))
    z = jnp.array([18, 18, 18])
    cfg = MapperConfig(
        max_nodes=4, max_explorations=2, afir_gamma=30.0,
        dist_lower_ang=0.5, dist_upper_ang=9.0, queue="boltzmann",
        work_dir=str(tmp_path),
        opt=OptimizeConfig(method="rfo_fsb", nsteps=40),
        autots=AutoTSConfig(
            n_images=6,
            neb=NEBConfig(variant="cineb", n_steps=15, k_spring=5e-4,
                          climbing_start=8, dt0=0.05, dt_max=0.4),
            saddle=OptimizeConfig(method="rfo_bofill", saddle_order=1,
                                  nsteps=30, fc_count=5,
                                  init_hessian="exact"),
            irc=IRCConfig(n_steps=15),
            endpoint_opt=OptimizeConfig(method="rfo_fsb", nsteps=40)))
    net = map_network(LennardJones(), coords, z, cfg)
    assert len(net.nodes) >= 1
    assert os.path.isfile(os.path.join(tmp_path, "network.json"))
    assert os.path.isfile(os.path.join(tmp_path, "explored_pairs.log"))
    # restart picks the persisted network up
    net2 = map_network(LennardJones(), coords, z, cfg)
    assert len(net2.nodes) >= len(net.nodes)
