"""Double-ended engines, orientation search, and the network mapper."""

import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.calculators.model_surfaces import (
    MB_MIN_A,
    MB_MIN_B,
    MB_TS_AB,
    MullerBrown,
)
from multioptpy_tpu.calculators import LennardJones
from multioptpy_tpu.drivers.ieip import IEIPConfig, ieip
from multioptpy_tpu.periodic import UFF_VDW_R

RMIN = float(UFF_VDW_R[18])


class TestDoubleEnded:
    def test_eip_locates_barrier_region(self):
        calc = MullerBrown()
        z = jnp.array([1])
        a = jnp.array([[MB_MIN_A[0], MB_MIN_A[1], 0.0]])
        b = jnp.array([[MB_MIN_B[0], MB_MIN_B[1], 0.0]])
        res = ieip(calc, a, b, z, IEIPConfig(
            engine="eip", n_steps=400, step_size=0.02, pull_strength=0.02,
            min_pair_distance=0.05))
        # midpoint must approach the AB saddle
        d = np.linalg.norm(np.asarray(res.ts_guess[0, :2])
                           - np.asarray(MB_TS_AB))
        assert d < 0.25

    def test_dimer_converges_to_saddle(self):
        calc = MullerBrown()
        z = jnp.array([1])
        a = jnp.array([[MB_TS_AB[0] - 0.08, MB_TS_AB[1] - 0.05, 0.0]])
        b = jnp.array([[MB_TS_AB[0] + 0.08, MB_TS_AB[1] + 0.05, 0.0]])
        res = ieip(calc, a, b, z, IEIPConfig(
            engine="dimer", n_steps=400, step_size=0.02, fmax=1e-6))
        d = np.linalg.norm(np.asarray(res.ts_guess[0, :2])
                           - np.asarray(MB_TS_AB))
        assert d < 0.02
        assert res.converged


def test_orientation_search_ranks_by_energy():
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    from multioptpy_tpu.workflows.orientsearch import orientation_search

    # Ar2 "host" + Ar "guest" fragment placed randomly
    coords = jnp.asarray([[0.0, 0.0, 0.0], [RMIN, 0.0, 0.0],
                          [RMIN / 2, RMIN, 2.0]])
    z = jnp.array([18, 18, 18])
    res = orientation_search(
        LennardJones(), coords, z, [3], n_samples=6,
        config=OptimizeConfig(method="rfo_fsb", max_force=1e-6,
                              rms_force=7e-7, max_displacement=1e-4,
                              rms_displacement=7e-5),
        n_opt_steps=60, seed=2)
    assert len(res.energies) == 6
    assert np.all(np.diff(res.energies) >= -1e-12)
    # best placement is the equilateral trimer
    assert res.energies[0] < -8e-4


def test_mapper_on_muller_brown_degenerate():
    # mapper needs >= 2 atoms for pair pushes; use a tiny LJ trimer and
    # just verify the bookkeeping: nodes/edges structures and persistence
    import tempfile, os
    from multioptpy_tpu.workflows.mapper import (
        EQNode, Network, TSEdge)

    nodes = [EQNode(np.zeros((3, 3)), -1.0), EQNode(np.ones((3, 3)), -0.5)]
    edges = [TSEdge(0, 1, np.full((3, 3), 0.5), -0.2)]
    net = Network(nodes=nodes, edges=edges)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "net.json")
        net.save(path, symbols=["Ar", "Ar", "Ar"])
        net2 = Network.load(path)
    assert len(net2.nodes) == 2 and len(net2.edges) == 1
    assert net2.edges[0].ts_energy == pytest.approx(-0.2)


def test_orientation_search_distance_placement():
    """-dist places the mobile fragment's center the given Angstrom from
    the host center before orientation sampling (ref:
    orientation_search.py:16)."""
    from multioptpy_tpu.drivers.optimize import OptimizeConfig
    from multioptpy_tpu.workflows.orientsearch import orientation_search

    coords = jnp.asarray([[0.0, 0.0, 0.0], [RMIN, 0.0, 0.0],
                          [RMIN / 2, RMIN, 2.0]])
    z = jnp.array([18, 18, 18])
    res = orientation_search(
        LennardJones(), coords, z, [3], n_samples=4,
        config=OptimizeConfig(method="rfo_fsb", max_force=1e-6,
                              rms_force=7e-7, max_displacement=1e-4,
                              rms_displacement=7e-5),
        n_opt_steps=0, max_shift=0.0, seed=3, distance_ang=6.0)
    # with no optimization steps and no random shift, every sample's guest
    # sits exactly 6 Angstrom from the host center
    host_center = np.asarray(coords[:2]).mean(axis=0)
    for geom in res.geometries:
        d = np.linalg.norm(geom[2] - host_center) * 0.52917721067
        assert d == pytest.approx(6.0, abs=1e-6)
