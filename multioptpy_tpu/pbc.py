"""Minimal periodic-boundary-condition utilities.

ref: multioptpy/Utils/pbc.py (minimum-image wrapping used by the MD driver's
PBC option, moleculardynamics.py:155). Orthorhombic and triclinic cells.
"""

import jax.numpy as jnp


def wrap_coordinates(coords, cell):
    """Wrap (N,3) Cartesian coords into the primary cell. cell: (3,3) rows
    are lattice vectors (Bohr)."""
    cell = jnp.asarray(cell, coords.dtype)
    frac = coords @ jnp.linalg.inv(cell)
    frac = frac - jnp.floor(frac)
    return frac @ cell


def minimum_image_displacement(d, cell):
    """Apply the minimum-image convention to displacement vectors (...,3)."""
    cell = jnp.asarray(cell, d.dtype)
    frac = d @ jnp.linalg.inv(cell)
    frac = frac - jnp.round(frac)
    return frac @ cell


def pairwise_distances_pbc(coords, cell):
    """(N,N) minimum-image distance matrix."""
    d = coords[:, None, :] - coords[None, :, :]
    d = minimum_image_displacement(d, cell)
    n = coords.shape[0]
    return jnp.sqrt(jnp.sum(d * d, axis=-1)
                    + jnp.eye(n, dtype=coords.dtype) * 1e-30)
