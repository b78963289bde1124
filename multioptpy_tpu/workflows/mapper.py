"""Reaction-network mapper: repeated AutoTS exploration with deduplication.

ref: multioptpy/Wrapper/mapper.py (2292 LoC): ReactionNetworkMapper :1220
drives AutoTS runs from a queue of AFIR perturbations (:760
PerturbationGenerator), dedupes nodes via RMSD/distance fingerprints
(:104-405 StructureChecker) and bond topology (:407), builds an EQ/TS graph
(:942-1136) persisted as JSON (:1040).

Lite TPU rebuild: the queue/graph logic stays host-side (cheap); each
exploration step is an on-device AutoTS run (AFIR push between a random
atom pair). Restartable via the saved JSON.
"""

import dataclasses
import json
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize
from multioptpy_tpu.workflows.autots import AutoTSConfig, autots


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    max_nodes: int = 10
    max_explorations: int = 20
    afir_gamma: float = 150.0
    dedupe_threshold: float = 0.15   # sorted-distance fingerprint, Bohr
    seed: int = 0
    opt: OptimizeConfig = dataclasses.field(
        default_factory=lambda: OptimizeConfig(method="rfo_fsb", nsteps=150))
    autots: AutoTSConfig = dataclasses.field(default_factory=AutoTSConfig)


class EQNode(NamedTuple):
    coords: np.ndarray
    energy: float


class TSEdge(NamedTuple):
    node_a: int
    node_b: int
    ts_coords: np.ndarray
    ts_energy: float


class Network(NamedTuple):
    nodes: list
    edges: list

    def save(self, path, symbols=None):
        """JSON persistence (ref: mapper.py:1040)."""
        data = {
            "symbols": list(symbols) if symbols is not None else None,
            "nodes": [{"energy": n.energy,
                       "coords": np.asarray(n.coords).tolist()}
                      for n in self.nodes],
            "edges": [{"a": e.node_a, "b": e.node_b,
                       "ts_energy": e.ts_energy,
                       "ts_coords": np.asarray(e.ts_coords).tolist()}
                      for e in self.edges],
        }
        with open(path, "w") as f:
            json.dump(data, f)

    @classmethod
    def load(cls, path):
        with open(path) as f:
            data = json.load(f)
        nodes = [EQNode(np.asarray(n["coords"]), n["energy"])
                 for n in data["nodes"]]
        edges = [TSEdge(e["a"], e["b"], np.asarray(e["ts_coords"]),
                        e["ts_energy"]) for e in data["edges"]]
        return cls(nodes=nodes, edges=edges)


def _fingerprint(coords):
    n = len(coords)
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    return np.sort(d[np.triu_indices(n, 1)])


def _find_node(coords, nodes, thresh):
    fp = _fingerprint(np.asarray(coords))
    for i, node in enumerate(nodes):
        if np.max(np.abs(fp - _fingerprint(node.coords))) < thresh:
            return i
    return None


def map_network(calc, coords, z, config=MapperConfig(), resume=None):
    """Explore the reaction network from one structure
    (ref: mapper.py:1372 run). Returns a Network."""
    rng = np.random.default_rng(config.seed)
    z = jnp.asarray(z)
    n_atoms = np.asarray(coords).shape[0]

    if resume is not None:
        net = Network.load(resume)
        nodes, edges = net.nodes, net.edges
    else:
        res0 = optimize(calc, jnp.asarray(coords), z, config=config.opt)
        nodes = [EQNode(np.asarray(res0.coords), float(res0.energy))]
        edges = []

    explored_pairs = set()
    for _ in range(config.max_explorations):
        if len(nodes) >= config.max_nodes:
            break
        # pick a node and an atom pair to push (ref: mapper.py:760)
        node_idx = int(rng.integers(len(nodes)))
        i, j = sorted(rng.choice(n_atoms, size=2, replace=False))
        key = (node_idx, int(i), int(j))
        if key in explored_pairs:
            continue
        explored_pairs.add(key)

        cfg = dataclasses.replace(
            config.autots, afir_gamma=config.afir_gamma,
            afir_fragm_1=(int(i) + 1,), afir_fragm_2=(int(j) + 1,))
        try:
            res = autots(calc, jnp.asarray(nodes[node_idx].coords), z, cfg)
        except Exception:
            continue
        if res.n_imaginary != 1:
            continue

        # register the two IRC endpoints and the TS edge
        ids = []
        for end_coords, end_e in ((res.reactant_coords, res.reactant_energy),
                                  (res.product_coords, res.product_energy)):
            found = _find_node(end_coords, nodes, config.dedupe_threshold)
            if found is None:
                nodes.append(EQNode(np.asarray(end_coords), end_e))
                found = len(nodes) - 1
            ids.append(found)
        if ids[0] != ids[1]:
            dup = any(e.node_a == ids[0] and e.node_b == ids[1]
                      and abs(e.ts_energy - res.ts_energy) < 1e-6
                      for e in edges)
            if not dup:
                edges.append(TSEdge(ids[0], ids[1],
                                    np.asarray(res.ts_coords),
                                    res.ts_energy))

    return Network(nodes=nodes, edges=edges)
