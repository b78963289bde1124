"""Angle / dihedral / out-of-plane restraint potentials.

ref: multioptpy/Potential/keep_angle_potential.py,
keep_dihedral_angle_potential.py, keep_outofplain_angle_potential.py.
Angles in configs are degrees (reference CLI convention). The atan2
formulations here are smooth everywhere except exactly at the geometric
singularities, replacing the reference's Taylor-patched acos branches.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.potentials.base import (
    BiasPotential,
    _angle,
    _dihedral,
    _fragment_center,
    idx0,
    register_potential,
)
from multioptpy_tpu.units import DEG2RAD


@register_potential
class KeepAnglePotential(BiasPotential):
    """0.5 k (theta - theta0)^2 over atoms (i, j, k), vertex j.
    params = [k, theta0_deg]."""

    name = "keep_angle"

    def __init__(self, spring_const, angle, atoms, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.theta0_deg = float(angle)
        self.atoms = idx0(atoms)

    def init_params(self):
        return np.array([self.k, self.theta0_deg], dtype=np.float64)

    def energy(self, coords, params):
        k, th0 = params[0], params[1] * DEG2RAD
        th = _angle(coords[self.atoms[0]], coords[self.atoms[1]],
                    coords[self.atoms[2]])
        return 0.5 * k * (th - th0) ** 2


@register_potential
class KeepAnglePotentialV2(BiasPotential):
    """Angle between three fragment centroids (ref: keep_angle_potential.py
    StructKeepAnglePotentialv2). params = [k, theta0_deg]."""

    name = "keep_angle_v2"

    def __init__(self, spring_const, angle, fragm_1, fragm_2, fragm_3, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.theta0_deg = float(angle)
        self.frags = [idx0(fragm_1), idx0(fragm_2), idx0(fragm_3)]

    def init_params(self):
        return np.array([self.k, self.theta0_deg], dtype=np.float64)

    def energy(self, coords, params):
        k, th0 = params[0], params[1] * DEG2RAD
        c1, c2, c3 = [_fragment_center(coords, f) for f in self.frags]
        th = _angle(c1, c2, c3)
        return 0.5 * k * (th - th0) ** 2


def _wrap_angle(x):
    """Wrap to (-pi, pi] so dihedral differences take the short way around."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


@register_potential
class KeepDihedralPotential(BiasPotential):
    """0.5 k (phi - phi0)^2 over atoms (i,j,k,l), periodic-wrapped.
    params = [k, phi0_deg] (ref: keep_dihedral_angle_potential.py)."""

    name = "keep_dihedral"

    def __init__(self, spring_const, angle, atoms, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.phi0_deg = float(angle)
        self.atoms = idx0(atoms)

    def init_params(self):
        return np.array([self.k, self.phi0_deg], dtype=np.float64)

    def energy(self, coords, params):
        k, p0 = params[0], params[1] * DEG2RAD
        a = self.atoms
        phi = _dihedral(coords[a[0]], coords[a[1]], coords[a[2]], coords[a[3]])
        return 0.5 * k * _wrap_angle(phi - p0) ** 2


@register_potential
class KeepDihedralPotentialV2(BiasPotential):
    """Dihedral over four fragment centroids. params = [k, phi0_deg]."""

    name = "keep_dihedral_v2"

    def __init__(self, spring_const, angle, fragm_1, fragm_2, fragm_3,
                 fragm_4, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.phi0_deg = float(angle)
        self.frags = [idx0(fragm_1), idx0(fragm_2), idx0(fragm_3), idx0(fragm_4)]

    def init_params(self):
        return np.array([self.k, self.phi0_deg], dtype=np.float64)

    def energy(self, coords, params):
        k, p0 = params[0], params[1] * DEG2RAD
        c = [_fragment_center(coords, f) for f in self.frags]
        phi = _dihedral(*c)
        return 0.5 * k * _wrap_angle(phi - p0) ** 2


@register_potential
class KeepDihedralPotentialCos(BiasPotential):
    """Cosine dihedral 0.5 V (1 - cos(n phi - phi0)) over fragment centroids
    (ref: keep_dihedral_angle_potential.py StructKeepDihedralAnglePotentialCos).
    params = [V, phi0_deg]; n static."""

    name = "keep_dihedral_cos"

    def __init__(self, potential_const, angle, multiplicity, fragm_1, fragm_2,
                 fragm_3, fragm_4, **kw):
        super().__init__(**kw)
        self.v = float(potential_const)
        self.phi0_deg = float(angle)
        self.n = float(multiplicity)
        self.frags = [idx0(fragm_1), idx0(fragm_2), idx0(fragm_3), idx0(fragm_4)]

    def init_params(self):
        return np.array([self.v, self.phi0_deg], dtype=np.float64)

    def energy(self, coords, params):
        v, p0 = params[0], params[1] * DEG2RAD
        c = [_fragment_center(coords, f) for f in self.frags]
        # the reference's cos variant routes through
        # Utils/calc_tools.torch_calc_dihedral_angle_from_vec, whose sign
        # is the NEGATIVE of the IUPAC convention its own harmonic
        # dihedral potential uses (internal inconsistency upstream,
        # pinned live by tests/test_reference_live11.py) — mirror it so
        # cos(n*phi - phi0) matches for asymmetric phi0
        phi = -_dihedral(*c)
        return 0.5 * v * (1.0 - jnp.cos(self.n * phi - p0))


@register_potential
class KeepOutOfPlanePotential(BiasPotential):
    """Harmonic restraint on the angle of bond (j->i) out of plane (j,k,l):
    0.5 k (chi - chi0)^2 (ref: keep_outofplain_angle_potential.py).
    atoms = (i, j, k, l) with j the central atom. params = [k, chi0_deg]."""

    name = "keep_out_of_plane"

    def __init__(self, spring_const, angle, atoms, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.chi0_deg = float(angle)
        self.atoms = idx0(atoms)

    def init_params(self):
        return np.array([self.k, self.chi0_deg], dtype=np.float64)

    def energy(self, coords, params):
        k, chi0 = params[0], params[1] * DEG2RAD
        i, j, kk, ll = self.atoms
        v = coords[i] - coords[j]
        n = jnp.cross(coords[kk] - coords[j], coords[ll] - coords[j])
        nn = jnp.sqrt(jnp.sum(n * n) + 1e-12)
        vn = jnp.sqrt(jnp.sum(v * v) + 1e-12)
        sin_chi = jnp.clip(jnp.dot(v, n) / (vn * nn), -1.0, 1.0)
        chi = jnp.arcsin(sin_chi)
        return 0.5 * k * (chi - chi0) ** 2


@register_potential
class KeepOutOfPlanePotentialV2(BiasPotential):
    """Out-of-plane over fragment centroids. params = [k, chi0_deg]."""

    name = "keep_out_of_plane_v2"

    def __init__(self, spring_const, angle, fragm_1, fragm_2, fragm_3,
                 fragm_4, **kw):
        super().__init__(**kw)
        self.k = float(spring_const)
        self.chi0_deg = float(angle)
        self.frags = [idx0(fragm_1), idx0(fragm_2), idx0(fragm_3), idx0(fragm_4)]

    def init_params(self):
        return np.array([self.k, self.chi0_deg], dtype=np.float64)

    def energy(self, coords, params):
        k, chi0 = params[0], params[1] * DEG2RAD
        c1, c2, c3, c4 = [_fragment_center(coords, f) for f in self.frags]
        v = c1 - c2
        n = jnp.cross(c3 - c2, c4 - c2)
        nn = jnp.sqrt(jnp.sum(n * n) + 1e-12)
        vn = jnp.sqrt(jnp.sum(v * v) + 1e-12)
        sin_chi = jnp.clip(jnp.dot(v, n) / (vn * nn), -1.0, 1.0)
        chi = jnp.arcsin(sin_chi)
        return 0.5 * k * (chi - chi0) ** 2
