"""Flat-bottom well / wall potentials with quintic switching.

ref: multioptpy/Potential/switching_potential.py:5 (WellPotential, fragment-
centroid distance), :70 (WellPotentialWall, cartesian wall), WellPotentialVP
(distance to a fixed point), WellPotentialAround; void_point_potential.py.

The piecewise well of the reference (5 branches at a<b<c<d,
ref: switching_potential.py:49-61) is reproduced branchlessly with nested
`jnp.where`; each region's polynomial has the same coefficients:
  r<=a       : linear ramp   -3.75 x + 2.875
  a<r<=b     : quintic switch 2 - 20x^3 + 30x^4 - 12x^5
  b<r<c      : 0 (flat bottom)
  c<=r<d     : quintic switch (long side)
  d<=r       : linear ramp (long side)
Wall energies are kJ/mol in configs; limit distances Angstrom.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.potentials.base import (
    BiasPotential,
    _fragment_center,
    idx0,
    register_potential,
)
from multioptpy_tpu.units import ANGSTROM2BOHR, HARTREE2KJMOL


def _well_shape(r, a, b, c, d):
    """Dimensionless piecewise well profile (energy scale 1)."""
    xs = 0.5 / (b - a) * r + (1.0 - 0.5 * b / (b - a))
    xl = 0.5 / (c - d) * r + (1.0 - 0.5 * c / (c - d))
    lin_s = -3.75 * xs + 2.875
    qui_s = 2.0 - 20.0 * xs ** 3 + 30.0 * xs ** 4 - 12.0 * xs ** 5
    qui_l = 2.0 - 20.0 * xl ** 3 + 30.0 * xl ** 4 - 12.0 * xl ** 5
    lin_l = -3.75 * xl + 2.875
    return jnp.where(
        r <= a, lin_s,
        jnp.where(r <= b, qui_s,
                  jnp.where(r < c, 0.0,
                            jnp.where(r < d, qui_l, lin_l))))


@register_potential
class WellPotential(BiasPotential):
    """Flat-bottom well on the fragment-centroid distance.
    params = [wall_energy_kjmol]. limits = (a, b, c, d) in Angstrom."""

    name = "well"

    def __init__(self, wall_energy, limits, fragm_1, fragm_2, **kw):
        super().__init__(**kw)
        self.wall_energy = float(wall_energy)
        self.limits = np.asarray(limits, dtype=np.float64) * ANGSTROM2BOHR
        self.f1 = idx0(fragm_1)
        self.f2 = idx0(fragm_2)

    def init_params(self):
        return np.array([self.wall_energy], dtype=np.float64)

    def energy(self, coords, params):
        e0 = params[0] / HARTREE2KJMOL
        c1 = _fragment_center(coords, self.f1)
        c2 = _fragment_center(coords, self.f2)
        r = jnp.sqrt(jnp.sum((c1 - c2) ** 2) + 1e-12)
        a, b, c, d = self.limits
        return e0 * _well_shape(r, a, b, c, d)


@register_potential
class WellPotentialVP(BiasPotential):
    """Well on the distance of each target atom to a fixed reference point
    (ref: switching_potential.py WellPotentialVP). point in Angstrom."""

    name = "well_vp"

    def __init__(self, wall_energy, limits, point, atoms, **kw):
        super().__init__(**kw)
        self.wall_energy = float(wall_energy)
        self.limits = np.asarray(limits, dtype=np.float64) * ANGSTROM2BOHR
        self.point = np.asarray(point, dtype=np.float64) * ANGSTROM2BOHR
        self.atoms = idx0(atoms)

    def init_params(self):
        return np.array([self.wall_energy], dtype=np.float64)

    def energy(self, coords, params):
        e0 = params[0] / HARTREE2KJMOL
        p = jnp.asarray(self.point, dtype=coords.dtype)
        d = coords[self.atoms] - p[None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        a, b, c, dd = self.limits
        return e0 * jnp.sum(_well_shape(r, a, b, c, dd))


@register_potential
class WellPotentialWall(BiasPotential):
    """Cartesian box wall: well profile applied per-axis to selected atoms
    (ref: switching_potential.py:70 WellPotentialWall). limits: per-axis
    (a,b,c,d) in Angstrom; `axis` in {'x','y','z'}."""

    name = "well_wall"

    def __init__(self, wall_energy, limits, axis, atoms, **kw):
        super().__init__(**kw)
        self.wall_energy = float(wall_energy)
        self.limits = np.asarray(limits, dtype=np.float64) * ANGSTROM2BOHR
        self.axis = {"x": 0, "y": 1, "z": 2}[axis]
        self.atoms = idx0(atoms)

    def init_params(self):
        return np.array([self.wall_energy], dtype=np.float64)

    def energy(self, coords, params):
        e0 = params[0] / HARTREE2KJMOL
        x = coords[self.atoms, self.axis]
        a, b, c, d = self.limits
        return e0 * jnp.sum(_well_shape(x, a, b, c, d))


@register_potential
class WellPotentialAround(BiasPotential):
    """Well on each target atom's distance to a fragment centroid
    (keeps solvent/ligand shells "around" a core,
    ref: switching_potential.py WellPotentialAround)."""

    name = "well_around"

    def __init__(self, wall_energy, limits, center_fragm, atoms, **kw):
        super().__init__(**kw)
        self.wall_energy = float(wall_energy)
        self.limits = np.asarray(limits, dtype=np.float64) * ANGSTROM2BOHR
        self.center = idx0(center_fragm)
        self.atoms = idx0(atoms)

    def init_params(self):
        return np.array([self.wall_energy], dtype=np.float64)

    def energy(self, coords, params):
        e0 = params[0] / HARTREE2KJMOL
        ctr = _fragment_center(coords, self.center)
        d = coords[self.atoms] - ctr[None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        a, b, c, dd = self.limits
        return e0 * jnp.sum(_well_shape(r, a, b, c, dd))


@register_potential
class VoidPointPotential(BiasPotential):
    """(k/n) (r - r0)^n between an atom and a fixed point
    (ref: void_point_potential.py). point/r0 in Angstrom; order n static.
    params = [k, r0_ang]."""

    name = "void_point"

    def __init__(self, spring_const, distance, order, point, atom, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.r0_ang = float(distance)
        self.n = float(order)
        self.point = np.asarray(point, dtype=np.float64) * ANGSTROM2BOHR
        # single 1-based atom or a list of them (the -vpp flag passes a
        # range, ref: interface.py:226)
        atoms = [atom] if np.isscalar(atom) else list(atom)
        self.atoms = np.asarray([int(a) - 1 for a in atoms], np.int32)

    def init_params(self):
        return np.array([self.k, self.r0_ang], dtype=np.float64)

    def energy(self, coords, params):
        k, r0 = params[0], params[1] * ANGSTROM2BOHR
        p = jnp.asarray(self.point, dtype=coords.dtype)
        d = coords[self.atoms] - p[None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        return jnp.sum((k / self.n) * (r - r0) ** self.n)
