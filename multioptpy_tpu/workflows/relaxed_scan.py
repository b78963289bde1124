"""Relaxed potential-energy-surface scan.

ref: multioptpy/Entrypoints/relaxed_scan.py:10 — linspace over a bond/angle/
dihedral target; each point is a constrained optimization seeded from the
previous point's geometry (Gaussian modredundant-style). The per-point
optimizations reuse the driver stack; a batched variant optimizing all scan
points simultaneously (vmapped, each with its own target) is the TPU-native
extra the reference cannot do.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.constraints import Constraints
from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize


class ScanResult(NamedTuple):
    values: np.ndarray          # scanned coordinate values (input units)
    energies: np.ndarray        # (P,)
    geometries: np.ndarray      # (P,N,3)
    converged: np.ndarray       # (P,) bool


def relaxed_scan(calc, coords, z, kind, atoms, start, stop, n_points,
                 config=OptimizeConfig(), bias_engine=None):
    """Scan one internal coordinate.

    kind: "bond" (Angstrom) | "angle" | "dihedral" (degrees)
    atoms: 1-based atom indices (2/3/4 of them).
    Each point: constrained optimize, seeded from the previous geometry
    (ref: relaxed_scan.py:80-125).
    """
    values = np.linspace(start, stop, n_points)
    geoms, energies, convs = [], [], []
    current = jnp.asarray(coords)
    for val in values:
        if kind == "bond":
            cons = Constraints(bonds=[(atoms[0], atoms[1], float(val))])
        elif kind == "angle":
            cons = Constraints(angles=[(atoms[0], atoms[1], atoms[2],
                                        float(val))])
        elif kind == "dihedral":
            cons = Constraints(dihedrals=[(atoms[0], atoms[1], atoms[2],
                                           atoms[3], float(val))])
        else:
            raise ValueError(f"unknown scan kind '{kind}'")
        res = optimize(calc, current, z, bias_engine=bias_engine,
                       config=config, constraints=cons)
        current = res.coords
        geoms.append(np.asarray(res.coords))
        energies.append(float(res.energy))
        convs.append(bool(res.converged))
    return ScanResult(values=values, energies=np.asarray(energies),
                      geometries=np.stack(geoms),
                      converged=np.asarray(convs))


def _constraint_for(kind, atoms, value):
    if kind == "bond":
        return {"bonds": [(atoms[0], atoms[1], float(value))]}
    if kind == "angle":
        return {"angles": [(atoms[0], atoms[1], atoms[2], float(value))]}
    if kind == "dihedral":
        return {"dihedrals": [(atoms[0], atoms[1], atoms[2], atoms[3],
                               float(value))]}
    raise ValueError(f"unknown scan kind '{kind}'")


def relaxed_scan_multi(calc, coords, z, targets, n_points,
                       config=OptimizeConfig(), bias_engine=None,
                       first_only=False):
    """Scan SEVERAL internal coordinates simultaneously (the reference's
    repeated `-scan kind atoms v1,v2` triples, relaxed_scan.py:45-104: all
    targets move in lockstep along their own linspace and every point is
    one constrained optimization).

    targets: list of (kind, atoms, start, stop) with 1-based atom indices;
    first_only: seed every point from the INPUT structure instead of the
    previous point (ref: -fo first_only).
    Returns a ScanResult whose `values` has shape (P, len(targets)).
    """
    targets = list(targets)
    if not targets:
        raise ValueError("no scan targets")
    grids = np.stack([np.linspace(start, stop, n_points)
                      for (_, _, start, stop) in targets], axis=1)  # (P,T)
    start_coords = jnp.asarray(coords)
    current = start_coords
    geoms, energies, convs = [], [], []
    for row in grids:
        merged = {"bonds": [], "angles": [], "dihedrals": []}
        for (kind, atoms, _, _), val in zip(targets, row):
            for key, items in _constraint_for(kind, atoms, val).items():
                merged[key].extend(items)
        cons = Constraints(bonds=merged["bonds"], angles=merged["angles"],
                           dihedrals=merged["dihedrals"])
        res = optimize(calc, current, z, bias_engine=bias_engine,
                       config=config, constraints=cons)
        current = start_coords if first_only else res.coords
        geoms.append(np.asarray(res.coords))
        energies.append(float(res.energy))
        convs.append(bool(res.converged))
    return ScanResult(values=grids, energies=np.asarray(energies),
                      geometries=np.stack(geoms),
                      converged=np.asarray(convs))
