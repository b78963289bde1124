"""Remaining bias potentials: universal, flux, nanoreactor, IDPP/CFB-ENM.

ref: multioptpy/Potential/{universal_potential, flux_potential,
nanoreactor_potential, idpp}.py.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.potentials.base import (
    BiasPotential,
    idx0,
    register_potential,
)
from multioptpy_tpu.units import ANGSTROM2BOHR, HARTREE2KJMOL


@register_potential
class UniversalPotential(BiasPotential):
    """Linear contraction toward the centroid of a target atom set:
    E = (c / Eh2kJ / nPairs) * sum_i |x_i - centroid|
    (ref: universal_potential.py). params = [const_kjmol]."""

    name = "universal"

    def __init__(self, const, atoms, **kw):
        super().__init__(**kw)
        self.const = float(const)
        self.idx = idx0(atoms)
        m = len(self.idx)
        self.n_pairs = max(m * (m - 1) // 2, 1)

    def init_params(self):
        return np.array([self.const], dtype=np.float64)

    def energy(self, coords, params):
        pts = coords[self.idx]
        centroid = jnp.mean(pts, axis=0)
        dist = jnp.sqrt(jnp.sum((pts - centroid) ** 2, axis=-1) + 1e-12)
        return params[0] / HARTREE2KJMOL / self.n_pairs * jnp.sum(dist)


@register_potential
class FluxPotential(BiasPotential):
    """Polynomial drift toward a target point: E = sum_i sum_k c_k
    (x_ik - d_k)^p_k with PER-AXIS constants/orders (ref:
    flux_potential.py:24 — NOTE the reference's -fp help string promises
    k/p*(x-x_0)^p but its code applies NO 1/p factor; behavior parity
    follows the code, pinned by tests/test_reference_live11.py).
    Scalars broadcast. Direction in Angstrom; params = [cx, cy, cz]."""

    name = "flux"

    def __init__(self, const, order, direction, atoms, **kw):
        super().__init__(**kw)
        self.const = np.broadcast_to(np.asarray(const, np.float64),
                                     (3,)).copy()
        self.order = np.broadcast_to(np.asarray(order, np.float64),
                                     (3,)).copy()
        self.direction = np.asarray(direction, np.float64) * ANGSTROM2BOHR
        self.idx = idx0(atoms)

    def init_params(self):
        return np.asarray(self.const, dtype=np.float64)

    def energy(self, coords, params):
        d = jnp.asarray(self.direction, coords.dtype)
        p = jnp.asarray(self.order, coords.dtype)
        diff = coords[self.idx] - d[None, :]
        return jnp.sum(params[None, :] * diff ** p[None, :])


@register_potential
class NanoReactorPotential(BiasPotential):
    """Time-dependent oscillating spherical piston (virtual nanoreactor,
    Wang et al. Nat. Chem. 6 (2014) 1044; ref: nanoreactor_potential.py):
    alternates a contraction phase (harmonic wall at the inner radius) and
    an expansion phase (wall at the outer radius), mass-weighted.
    Time (a.u.) enters through params[0] so the MD driver can trace it.
    """

    name = "nanoreactor"

    def __init__(self, inner_wall_ang, outer_wall_ang, contraction_time,
                 expansion_time, contraction_k, expansion_k, element_z, **kw):
        super().__init__(**kw)
        from multioptpy_tpu.periodic import MASS_AMU
        self.r_in = float(inner_wall_ang) * ANGSTROM2BOHR
        self.r_out = float(outer_wall_ang) * ANGSTROM2BOHR
        self.t_c = float(contraction_time)
        self.t_e = float(expansion_time)
        self.k_c = float(contraction_k)
        self.k_e = float(expansion_k)
        self.masses = np.asarray(MASS_AMU)[np.asarray(element_z)]

    def init_params(self):
        return np.array([0.0], dtype=np.float64)  # params[0] = time (a.u.)

    def energy(self, coords, params):
        t = params[0]
        m = jnp.asarray(self.masses, coords.dtype)
        r = jnp.sqrt(jnp.sum(coords ** 2, axis=-1) + 1e-12)
        period = self.t_c + self.t_e
        phase = t / period - jnp.floor(t / period)
        contracting = phase < (self.t_c / period)
        u_c = jnp.where(r > self.r_in,
                        0.5 * m * self.k_c * (r - self.r_in) ** 2, 0.0)
        u_e = jnp.where(r > self.r_out,
                        0.5 * m * self.k_e * (r - self.r_out) ** 2, 0.0)
        return jnp.sum(jnp.where(contracting, u_c, u_e))


@register_potential
class IDPPBias(BiasPotential):
    """Image-dependent pair potential as a standalone bias: keeps a geometry
    near a TARGET distance matrix with w = d^-4 weights (Smidstrup 2014;
    ref: Potential/idpp.py:10). params = [strength]."""

    name = "idpp_bias"

    def __init__(self, target_coords, strength=1.0, **kw):
        super().__init__(**kw)
        tc = np.asarray(target_coords, np.float64)
        d = np.linalg.norm(tc[:, None] - tc[None, :], axis=-1)
        self.d_target = d
        self.strength = float(strength)

    def init_params(self):
        return np.array([self.strength], dtype=np.float64)

    def energy(self, coords, params):
        n = coords.shape[0]
        mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
        diff = coords[:, None, :] - coords[None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        w = jnp.where(mask, 1.0 / d ** 4, 0.0)
        tgt = jnp.asarray(self.d_target, coords.dtype)
        return 0.5 * params[0] * jnp.sum(
            jnp.where(mask, w * (d - tgt) ** 2, 0.0))


@register_potential
class CFBElasticNetwork(BiasPotential):
    """Correlated flat-bottom elastic network: harmonic penalty only outside
    a tolerance band around reference pair distances, restricted to a bonded
    network (ref: Potential/idpp.py:186 CFB_ENM). params = [k]."""

    name = "cfb_enm"

    def __init__(self, reference_coords, element_z, k=0.1, tolerance=0.2,
                 scale=1.3, **kw):
        super().__init__(**kw)
        from multioptpy_tpu.periodic import COVALENT_RADII_1
        rc = np.asarray(reference_coords, np.float64)
        z = np.asarray(element_z)
        d = np.linalg.norm(rc[:, None] - rc[None, :], axis=-1)
        radii = np.asarray(COVALENT_RADII_1)[z]
        bonded = (d < scale * (radii[:, None] + radii[None, :]))
        np.fill_diagonal(bonded, False)
        self.pairs = np.argwhere(np.triu(bonded, 1))
        self.d_ref = d[self.pairs[:, 0], self.pairs[:, 1]]
        self.k = float(k)
        self.tol = float(tolerance)

    def init_params(self):
        return np.array([self.k], dtype=np.float64)

    def energy(self, coords, params):
        if len(self.pairs) == 0:
            return jnp.asarray(0.0, coords.dtype)
        a = coords[self.pairs[:, 0]]
        b = coords[self.pairs[:, 1]]
        d = jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + 1e-12)
        dev = jnp.abs(d - jnp.asarray(self.d_ref, coords.dtype))
        over = jnp.maximum(dev - self.tol, 0.0)
        return 0.5 * params[0] * jnp.sum(over ** 2)
