"""Orientation search: random rigid-body placements of a fragment.

ref: multioptpy/Entrypoints/orientation_search.py:10 — sample N random
orientations (rotation + translation) of the `-part` fragment, optimize
each. TPU-native: all samples optimize simultaneously as one batch.
"""

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize_batch


class OrientResult(NamedTuple):
    geometries: np.ndarray     # (S,N,3) energy-sorted
    energies: np.ndarray


def _random_rotation(rng):
    # uniform rotation via QR of a Gaussian matrix
    q, r = np.linalg.qr(rng.standard_normal((3, 3)))
    return q * np.sign(np.diag(r))


def orientation_search(calc, coords, z, fragment_atoms, n_samples=16,
                       config=OptimizeConfig(), bias_engine=None,
                       max_shift=2.0, n_opt_steps=100, seed=0,
                       distance_ang=None):
    """fragment_atoms: 1-based indices of the mobile fragment.

    distance_ang: place the fragment's center this many Angstrom from the
    center of the remaining atoms (along the original separation axis)
    before sampling orientations (ref: orientation_search.py:16 -dist)."""
    rng = np.random.default_rng(seed)
    coords_np = np.asarray(coords)
    idx = np.asarray(fragment_atoms) - 1
    rest = np.setdiff1d(np.arange(len(coords_np)), idx)

    place_center = None
    if distance_ang is not None and len(rest):
        from multioptpy_tpu.units import ANGSTROM2BOHR
        rest_center = coords_np[rest].mean(axis=0)
        axis = coords_np[idx].mean(axis=0) - rest_center
        nrm = np.linalg.norm(axis)
        axis = axis / nrm if nrm > 1e-8 else np.array([1.0, 0.0, 0.0])
        place_center = rest_center + axis * distance_ang * ANGSTROM2BOHR

    samples = []
    for _ in range(n_samples):
        new = coords_np.copy()
        frag = coords_np[idx]
        center = frag.mean(axis=0)
        if place_center is not None:
            frag = frag - center + place_center
            center = place_center
        rot = _random_rotation(rng)
        shift = rng.uniform(-max_shift, max_shift, size=3)
        new[idx] = (frag - center) @ rot.T + center + shift
        # reject overlapping placements by re-drawing the shift
        for _retry in range(20):
            d = np.linalg.norm(new[idx][:, None] - new[rest][None, :],
                               axis=-1) if len(rest) else np.array([[9.9]])
            if d.min() > 1.5:
                break
            shift = rng.uniform(-max_shift, max_shift, size=3)
            new[idx] = (frag - center) @ rot.T + center + shift
        samples.append(new)

    batch = jnp.asarray(np.stack(samples))
    res = optimize_batch(calc, batch, jnp.asarray(z), bias_engine=bias_engine,
                         config=config, n_steps=n_opt_steps)
    e = np.asarray(res.energy)
    order = np.argsort(e)
    return OrientResult(geometries=np.asarray(res.coords)[order],
                        energies=e[order])
