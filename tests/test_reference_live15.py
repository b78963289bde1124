"""LIVE parity wave 15: the RCMC kinetics queue (Utils/rcmc.py) — the
reference's rate-constant-matrix-contraction code executed on a shared
reaction network, side by side with our workflows.kinetics numerics.

Conventions learned by execution (ref: Utils/rcmc.py):

  * Importing multioptpy.Utils.rcmc transitively imports Wrapper.mapper,
    whose `from multioptpy.Wrapper.autots import AutoTSWorkflow` triggers
    Wrapper/autots.py's import-failure handler: it sys.exit(1)s when the
    QM wrapper chain (ASE absent in this image) cannot load — mapper's
    own `except ImportError` guard (mapper.py:31) never sees it because
    SystemExit is not an ImportError. The tests stub
    sys.modules['multioptpy.Wrapper.autots'] before the import.
  * The rate matrix (rcmc.py:197-221): k_uv = kB T/h exp(-(max(E_TS,E_u)
    - E_u)/kB T) with K[v,u] ACCUMULATED over parallel edges and the
    diagonal set to column-sum-zero. Our workflows.kinetics.rate_matrix
    is the same formula (barrier clamp max(TS,E)-E == max(barrier, 0));
    pinned here THROUGH the reference's own Schur-complement contraction:
    with reaction_time_s=0 pop() contracts exactly one state (the
    largest-|diagonal| one) and saves D = Schur complement of K — equal
    to the same contraction of OUR K to the CSV's 1e-6 precision.
  * The contraction absorbs the removed state into the T state with the
    largest |K_Tj| coupling (rcmc.py:285-291) — superstate membership
    line pinned.
  * Priorities: the reference's q is the contracted-network transient
    population estimate; ours is the exact expm(K t) p0 population. On a
    shared network both normalize to 1 and agree on the kinetically
    dominant node at the same reaction time.
  * should_add: the reference returns True unconditionally (rcmc.py:54),
    DISABLING the base class's acceptance-probability semantics; ours
    deliberately keeps Boltzmann acceptance (VERDICT r2 weak #6) — the
    divergence is pinned, not copied.

Ref anchors: Utils/rcmc.py:26-412, Wrapper/mapper.py:501-540 (task/queue
contracts).
"""

import contextlib
import io
import os
import sys
import types
from dataclasses import dataclass, field

import numpy as np
import pytest

_REF = "/root/reference/multioptpy"
pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference tree not mounted")


def _ref_module(name):
    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = [_REF]
        sys.modules["multioptpy"] = pkg
    # Wrapper/autots.py sys.exit(1)s in this image (no ASE); stub it so
    # Wrapper.mapper's guarded import works (see module docstring)
    if "multioptpy.Wrapper.autots" not in sys.modules:
        stub = types.ModuleType("multioptpy.Wrapper.autots")
        stub.AutoTSWorkflow = object
        sys.modules["multioptpy.Wrapper.autots"] = stub
    import importlib

    return importlib.import_module(name)


# ---- duck-typed network for the reference queue --------------------------

@dataclass
class _Node:
    node_id: int
    energy: float
    has_real_energy: bool = True


@dataclass
class _Edge:
    node_id_1: int
    node_id_2: int
    ts_energy: float


@dataclass
class _Graph:
    nodes: list = field(default_factory=list)
    edges: list = field(default_factory=list)

    def all_nodes(self):
        return self.nodes

    def all_edges(self):
        return self.edges


def _shared_network():
    """4-state network with a clear kinetic structure: a fast-equilibrating
    pair (0<->1, low barrier), a slower channel to 2, a high barrier to 3,
    a barrierless edge (TS below both minima -> max() clamp exercised) and
    a PARALLEL duplicate edge 0-1 (accumulation exercised)."""
    energies = [0.0, -0.002, -0.010, 0.004]
    edges = [(0, 1, 0.004), (0, 1, 0.006),       # parallel edges
             (1, 2, 0.010),
             (2, 3, 0.030),
             (0, 2, -0.012)]                     # TS below both minima
    return energies, edges


def _ref_graph(energies, edges):
    g = _Graph()
    g.nodes = [_Node(i, e) for i, e in enumerate(energies)]
    g.edges = [_Edge(a, b, ts) for a, b, ts in edges]
    return g


def _our_network(energies, edges):
    from multioptpy_tpu.workflows.mapper import EQNode, Network, TSEdge

    nodes = [EQNode(np.zeros((1, 3)), e) for e in energies]
    es = [TSEdge(a, b, np.zeros((1, 3)), ts) for a, b, ts in edges]
    return Network(nodes=nodes, edges=es)


def _run_ref_pop(tmp_path, energies, edges, reaction_time, start=0):
    rcmc = _ref_module("multioptpy.Utils.rcmc")
    mapper = _ref_module("multioptpy.Wrapper.mapper")
    q = rcmc.RCMCQueue(temperature_K=300.0, reaction_time_s=reaction_time,
                       start_node_id=start, output_dir=str(tmp_path))
    q.set_graph(_ref_graph(energies, edges))
    for i in range(len(energies)):
        q._tasks.append(mapper.ExplorationTask(
            node_id=i, xyz_file=f"eq{i}.xyz", afir_params=[]))
    with contextlib.redirect_stdout(io.StringIO()):
        selected = q.pop()
    return q, selected, os.path.join(str(tmp_path), "rcmc_K_contracted.csv")


def _parse_csv(path):
    """-> (D matrix, T labels, superstate members line, {node: q})."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    members_line = lines[1]
    labels = lines[2].split(",")[1:]
    n = len(labels)
    d = np.array([[float(x) for x in lines[3 + i].split(",")[1:]]
                  for i in range(n)])
    qs = {}
    for ln in lines[3 + n:]:
        if ln.startswith("EQ") and "," in ln:
            name, val = ln.split(",")
            qs[int(name[2:])] = float(val)
    return d, labels, members_line, qs


def _our_rate_matrix(energies, edges):
    from multioptpy_tpu.workflows.kinetics import rate_matrix

    return rate_matrix(_our_network(energies, edges), temperature=300.0)


# ==========================================================================
# rate matrix through the reference's own contraction
# ==========================================================================

def test_rate_matrix_live_via_single_contraction(tmp_path):
    """reaction_time_s=0 stops the reference after ONE Schur contraction;
    its saved D equals the same contraction applied to OUR rate matrix."""
    energies, edges = _shared_network()
    _, _, csv = _run_ref_pop(tmp_path, energies, edges, reaction_time=0.0)
    d_ref, labels, members, _ = _parse_csv(csv)

    k = _our_rate_matrix(energies, edges)
    # the reference removes the largest-|diagonal| state first
    j = int(np.argmax(np.abs(np.diag(k))))
    mask = np.ones(len(energies), dtype=bool)
    mask[j] = False
    d_ours = (k[np.ix_(mask, mask)]
              - np.outer(k[mask, j], k[j, mask]) / k[j, j])
    off = d_ours.sum(axis=0) - d_ours.diagonal()
    np.fill_diagonal(d_ours, -off)

    remaining = [i for i in range(len(energies)) if i != j]
    assert labels == [f"EQ{i}" for i in remaining]
    np.testing.assert_allclose(d_ref, d_ours, rtol=2e-6,
                               atol=1e-6 * np.abs(d_ours).max())
    # the absorbed state joined its strongest-coupled survivor
    absorb = remaining[int(np.argmax(np.abs(k[mask, j])))]
    assert (f"EQ{absorb}=[EQ{absorb}+EQ{j}]" in members
            or f"EQ{absorb}=[EQ{j}+EQ{absorb}]" in members)


def test_rate_matrix_barrier_clamp_and_accumulation():
    """Direct formula parity on the shared fixture: Eyring with the
    max(E_TS, E_minimum) clamp, parallel-edge accumulation, column-sum
    zero. (Constants: the reference hardcodes kB = 3.166811563e-6 Eh/K;
    ours derives it — equal to 10 digits.)"""
    from multioptpy_tpu.units import KB_HARTREE

    rcmc = _ref_module("multioptpy.Utils.rcmc")
    assert abs(rcmc.K_B_HARTREE - KB_HARTREE) < 1e-15

    energies, edges = _shared_network()
    k = _our_rate_matrix(energies, edges)
    # column sums are zero (probability conservation)
    np.testing.assert_allclose(k.sum(axis=0), 0.0, atol=1e-8 * np.abs(k).max())
    # the barrierless 0-2 edge contributes the unactivated kB T/h rate in
    # the downhill direction (max clamp -> zero barrier both ways here)
    kbt_h = rcmc.K_B_J_K * 300.0 / rcmc.H_J_S
    assert k[2, 0] >= kbt_h * 0.999
    # parallel 0-1 edges accumulate: remove one and the rate drops
    k_single = _our_rate_matrix(energies, [e for e in edges
                                           if e != (0, 1, 0.006)])
    assert k[1, 0] > k_single[1, 0]


# ==========================================================================
# populations / priorities
# ==========================================================================

def test_population_priorities_live_vs_ours(tmp_path):
    """Full contraction at a chemically meaningful reaction time: the
    reference's q and our expm-populations both normalize to 1 and agree
    on the kinetically dominant node and on the selected task."""
    from multioptpy_tpu.workflows.kinetics import kinetic_priorities

    energies, edges = _shared_network()
    t_rxn = 1e-3
    queue, selected, csv = _run_ref_pop(tmp_path, energies, edges,
                                        reaction_time=t_rxn, start=0)
    _, _, _, q_ref = _parse_csv(csv)
    q_ref_arr = np.array([q_ref[i] for i in range(len(energies))])
    np.testing.assert_allclose(q_ref_arr.sum(), 1.0, atol=1e-8)

    p_ours = kinetic_priorities(_our_network(energies, edges),
                                temperature=300.0, reaction_time=t_rxn,
                                start_node=0)
    np.testing.assert_allclose(p_ours.sum(), 1.0, atol=1e-12)
    assert int(np.argmax(q_ref_arr)) == int(np.argmax(p_ours))
    # the selected task is the dominant node on both sides
    assert selected.node_id == int(np.argmax(p_ours))


def test_should_add_semantics_divergence_pinned():
    """ref RCMCQueue.should_add is unconditionally True (rcmc.py:54);
    ours keeps Boltzmann acceptance (deliberate, VERDICT r2 weak #6)."""
    rcmc = _ref_module("multioptpy.Utils.rcmc")
    from multioptpy_tpu.workflows.mapper import RCMCQueue as OurQueue

    ref_q = rcmc.RCMCQueue()
    assert ref_q.should_add(None, 0.0) is True
    assert ref_q.should_add(None, 1e9) is True   # even absurd energies

    ours = OurQueue(rng_seed=7)
    # downhill always accepted; a huge uphill move is (almost) never
    assert ours.should_add(-1.0)
    acc = sum(ours.should_add(0.5) for _ in range(200))
    assert acc < 40  # floor is 5%, Boltzmann factor astronomically small


def test_start_node_fallback_live(tmp_path):
    """When start_node_id is not in the graph the reference seeds p at the
    GLOBAL MINIMUM node (rcmc.py:239) — pinned; ours requires an explicit
    in-range start node by contract."""
    energies, edges = _shared_network()
    _, _, csv = _run_ref_pop(tmp_path, energies, edges,
                             reaction_time=1e-3, start=99)
    _, _, _, q_ref = _parse_csv(csv)
    q_arr = np.array([q_ref[i] for i in range(len(energies))])

    from multioptpy_tpu.workflows.kinetics import kinetic_priorities

    p_ours = kinetic_priorities(_our_network(energies, edges),
                                temperature=300.0, reaction_time=1e-3,
                                start_node=int(np.argmin(energies)))
    assert int(np.argmax(q_arr)) == int(np.argmax(p_ours))
