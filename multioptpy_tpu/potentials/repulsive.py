"""Lennard-Jones repulsive / attractive fragment-pair bias potentials.

ref: multioptpy/Potential/LJ_repulsive_potential.py:9 (Scale), :64 (Value),
:117/:180 (v2 variants with per-pair exclusion and custom exponents).
UFF vdW parameters (JACS 114, 10024 (1992)) with geometric-mean combination;
"Scale" multiplies the UFF well/distance by global factors, "Value" replaces
them with explicit values. params = [well_scale_or_value, dist_scale_or_value].
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.periodic import UFF_VDW_EPS, UFF_VDW_R
from multioptpy_tpu.potentials.base import BiasPotential, idx0, register_potential
from multioptpy_tpu.units import ANGSTROM2BOHR, HARTREE2KCALMOL


class _PairwiseLJ(BiasPotential):
    def __init__(self, fragm_1, fragm_2, element_z, **kw):
        super().__init__(**kw)
        self.i_idx = idx0(fragm_1)
        self.j_idx = idx0(fragm_2)
        z = np.asarray(element_z)
        self.eps_i = np.asarray(UFF_VDW_EPS)[z[self.i_idx]]
        self.eps_j = np.asarray(UFF_VDW_EPS)[z[self.j_idx]]
        self.rv_i = np.asarray(UFF_VDW_R)[z[self.i_idx]]
        self.rv_j = np.asarray(UFF_VDW_R)[z[self.j_idx]]

    def _pair_dist(self, coords):
        diff = coords[self.i_idx][:, None, :] - coords[self.j_idx][None, :, :]
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


@register_potential
class LJRepulsiveScale(_PairwiseLJ):
    """E = sum eps_ij [ (r0/r)^12 - 2 (r0/r)^6 ] with
    eps_ij = sqrt(ws^2 eps_i eps_j), r0 = sqrt(ds^2 Rv_i Rv_j)
    (ref: LJ_repulsive_potential.py:43-62)."""

    name = "lj_repulsive_scale"

    def __init__(self, well_scale, dist_scale, fragm_1, fragm_2, element_z, **kw):
        super().__init__(fragm_1, fragm_2, element_z, **kw)
        self.well_scale = float(well_scale)
        self.dist_scale = float(dist_scale)

    def init_params(self):
        return np.array([self.well_scale, self.dist_scale], dtype=np.float64)

    def energy(self, coords, params):
        ws, ds = params[0], params[1]
        eps = jnp.sqrt(ws ** 2 * jnp.asarray(self.eps_i[:, None] * self.eps_j[None, :],
                                             dtype=coords.dtype))
        r0 = jnp.sqrt(ds ** 2 * jnp.asarray(self.rv_i[:, None] * self.rv_j[None, :],
                                            dtype=coords.dtype))
        r = self._pair_dist(coords)
        s6 = (r0 / r) ** 6
        return jnp.sum(eps * (s6 * s6 - 2.0 * s6))


@register_potential
class LJRepulsiveValue(_PairwiseLJ):
    """Same form with explicit well depth (kJ/mol) and distance (Angstrom)
    for every pair (ref: LJ_repulsive_potential.py:64-115).
    params = [well_kjmol... actually [well_value, dist_value_ang]]."""

    name = "lj_repulsive_value"

    def __init__(self, well_value_kcal, dist_value_ang, fragm_1, fragm_2,
                 element_z, **kw):
        super().__init__(fragm_1, fragm_2, element_z, **kw)
        self.well_value = float(well_value_kcal)
        self.dist_value = float(dist_value_ang)

    def init_params(self):
        return np.array([self.well_value, self.dist_value], dtype=np.float64)

    def energy(self, coords, params):
        eps = params[0] / HARTREE2KCALMOL
        r0 = params[1] * ANGSTROM2BOHR
        r = self._pair_dist(coords)
        s6 = (r0 / r) ** 6
        return jnp.sum(eps * (s6 * s6 - 2.0 * s6))


@register_potential
class LJRepulsiveV2(_PairwiseLJ):
    """v2: custom exponents (a, b) for the repulsive/attractive terms and
    scale factors, E = sum eps[ (r0/r)^a - 2 (r0/r)^b ]
    (ref: LJ_repulsive_potential.py:117-243). Exponents static."""

    name = "lj_repulsive_v2"

    def __init__(self, well_scale, dist_scale, exp_a, exp_b, fragm_1, fragm_2,
                 element_z, **kw):
        super().__init__(fragm_1, fragm_2, element_z, **kw)
        self.well_scale = float(well_scale)
        self.dist_scale = float(dist_scale)
        self.a = float(exp_a)
        self.b = float(exp_b)

    def init_params(self):
        return np.array([self.well_scale, self.dist_scale], dtype=np.float64)

    def energy(self, coords, params):
        ws, ds = params[0], params[1]
        eps = jnp.sqrt(ws ** 2 * jnp.asarray(self.eps_i[:, None] * self.eps_j[None, :],
                                             dtype=coords.dtype))
        r0 = jnp.sqrt(ds ** 2 * jnp.asarray(self.rv_i[:, None] * self.rv_j[None, :],
                                            dtype=coords.dtype))
        r = self._pair_dist(coords)
        x = r0 / r
        return jnp.sum(eps * (x ** self.a - 2.0 * x ** self.b))
