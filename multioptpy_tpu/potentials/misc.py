"""Mechanochemical force, electrostatic, value-range, and metadynamics
bias potentials.

ref: multioptpy/Potential/{mechano_force_potential, electrostatic_potential,
value_range_potential, gaussian_potential}.py.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.periodic import UFF_EFFECTIVE_CHARGE
from multioptpy_tpu.potentials.base import (
    BiasPotential,
    _dist,
    _fragment_center,
    idx0,
    register_potential,
)
from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM, HARTREE2KCALMOL

# 1 pN expressed in Hartree/Bohr
_PN2AU = 1.0e-12 / (4.3597447222071e-18 / 5.29177210903e-11)
_COULOMB_KCAL = 332.0637  # kcal/mol * Angstrom / e^2


@register_potential
class LinearMechanoForce(BiasPotential):
    """Constant external force (pN) applied along two bond directions (EFEI-
    style mechanochemistry, ref: mechano_force_potential.py:
    LinearMechanoForcePotential). params = [force_pN]."""

    name = "mechano_force"

    def __init__(self, force_pn, atoms_1, atoms_2, **kw):
        super().__init__(**kw)
        self.force_pn = float(force_pn)
        self.a1 = idx0(atoms_1)
        self.a2 = idx0(atoms_2)

    def init_params(self):
        return np.array([self.force_pn], dtype=np.float64)

    def energy(self, coords, params):
        f = 0.5 * params[0] * _PN2AU
        d1 = coords[self.a1[1]] - coords[self.a1[0]]
        d2 = coords[self.a2[1]] - coords[self.a2[0]]
        u1 = d1 / jnp.sqrt(jnp.sum(d1 * d1) + 1e-12)
        u2 = d2 / jnp.sqrt(jnp.sum(d2 * d2) + 1e-12)
        return f * (jnp.sum(u1) + jnp.sum(u2))


@register_potential
class LinearMechanoForceV2(BiasPotential):
    """Force f pulling two atoms apart along their connecting line:
    E = -f * r_ij (ref: mechano_force_potential.py v2).
    params = [force_pN]."""

    name = "mechano_force_v2"

    def __init__(self, force_pn, atom_pair, **kw):
        super().__init__(**kw)
        self.force_pn = float(force_pn)
        self.pair = idx0(atom_pair)

    def init_params(self):
        return np.array([self.force_pn], dtype=np.float64)

    def energy(self, coords, params):
        f = params[0] * _PN2AU
        r = _dist(coords[self.pair[0]], coords[self.pair[1]])
        return -f * r


class _Electrostatic(BiasPotential):
    """Coulomb with UFF effective charges, kcal/mol convention
    (ref: electrostatic_potential.py: 332.0637 q_i q_j / r_ang)."""

    def _coulomb(self, coords, scale, qi, qj, i_idx, j_idx, pair_mask=None):
        diff = coords[i_idx][:, None, :] - coords[j_idx][None, :, :]
        r_ang = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12) * BOHR2ANGSTROM
        qq = scale * qi[:, None] * qj[None, :]
        e = _COULOMB_KCAL * qq / r_ang / HARTREE2KCALMOL
        if pair_mask is not None:
            e = jnp.where(pair_mask, e, 0.0)
        return jnp.sum(e)


@register_potential
class ElectrostaticFragment(_Electrostatic):
    """All pairs between two fragments. params = [charge_scale]."""

    name = "electrostatic_fragment"

    def __init__(self, charge_scale, fragm_1, fragm_2, element_z, **kw):
        super().__init__(**kw)
        self.scale = float(charge_scale)
        self.i_idx = idx0(fragm_1)
        self.j_idx = idx0(fragm_2)
        z = np.asarray(element_z)
        self.qi = np.asarray(UFF_EFFECTIVE_CHARGE)[z[self.i_idx]]
        self.qj = np.asarray(UFF_EFFECTIVE_CHARGE)[z[self.j_idx]]

    def init_params(self):
        return np.array([self.scale], dtype=np.float64)

    def energy(self, coords, params):
        qi = jnp.asarray(self.qi, dtype=coords.dtype)
        qj = jnp.asarray(self.qj, dtype=coords.dtype)
        return self._coulomb(coords, params[0], qi, qj, self.i_idx, self.j_idx)


@register_potential
class ElectrostaticAtomPair(_Electrostatic):
    """All unique pairs within one atom set
    (ref: electrostatic_potential.py ElectroStaticPotentialAtomPair)."""

    name = "electrostatic_atom_pair"

    def __init__(self, charge_scale, atoms, element_z, **kw):
        super().__init__(**kw)
        self.scale = float(charge_scale)
        self.idx = idx0(atoms)
        z = np.asarray(element_z)
        self.q = np.asarray(UFF_EFFECTIVE_CHARGE)[z[self.idx]]
        m = len(self.idx)
        self.mask = np.triu(np.ones((m, m), dtype=bool), k=1)

    def init_params(self):
        return np.array([self.scale], dtype=np.float64)

    def energy(self, coords, params):
        q = jnp.asarray(self.q, dtype=coords.dtype)
        return self._coulomb(coords, params[0], q, q, self.idx, self.idx,
                             jnp.asarray(self.mask))


@register_potential
class ValueRangePotential(BiasPotential):
    """Softplus walls keeping a fragment distance inside [lower, upper]
    (bond range potential, JCP 10.1063/5.0197592):

        E = log[(1 + e^{ku (r - upper)}) (1 + e^{kl (lower - r)})]

    exactly the reference's form (ref: value_range_potential.py:35),
    evaluated as two numerically-stable softplus terms — the round-1
    version used one-sided harmonics, which have the same walls but the
    wrong profile/tails. params = [k_upper, k_lower]."""

    name = "value_range"

    def __init__(self, upper_const, lower_const, upper_distance,
                 lower_distance, fragm_1, fragm_2, **kw):
        super().__init__(**kw)
        self.ku = float(upper_const)
        self.kl = float(lower_const)
        self.upper = float(upper_distance) * ANGSTROM2BOHR
        self.lower = float(lower_distance) * ANGSTROM2BOHR
        self.f1 = idx0(fragm_1)
        self.f2 = idx0(fragm_2)

    def init_params(self):
        return np.array([self.ku, self.kl], dtype=np.float64)

    def energy(self, coords, params):
        import jax

        ku, kl = params[0], params[1]
        c1 = _fragment_center(coords, self.f1)
        c2 = _fragment_center(coords, self.f2)
        r = jnp.sqrt(jnp.sum((c1 - c2) ** 2) + 1e-12)
        return (jax.nn.softplus(ku * (r - self.upper))
                + jax.nn.softplus(kl * (self.lower - r)))


@register_potential
class GaussianBiasPotential(BiasPotential):
    """Metadynamics hills on a bond collective variable with a static-shape
    history buffer (ref: gaussian_potential.py; the reference grows a python
    list per step — here `deposit()` fills a fixed (max_hills,) array so the
    energy stays jittable with an unchanging signature).

    E = sum_h height * exp(-(cv - center_h)^2 / (2 width^2))
    """

    name = "gaussian_metadyn"

    def __init__(self, height_kjmol, width_ang, atom_pair, max_hills=512, **kw):
        super().__init__(**kw)
        from multioptpy_tpu.units import HARTREE2KJMOL
        self.height = float(height_kjmol) / HARTREE2KJMOL
        self.width = float(width_ang) * ANGSTROM2BOHR
        self.pair = idx0(atom_pair)
        self.max_hills = int(max_hills)
        self.centers = np.zeros((self.max_hills,), dtype=np.float64)
        self.n_hills = 0

    def deposit(self, cv_value_bohr):
        if self.n_hills >= self.max_hills:
            raise RuntimeError(f"metadynamics history full ({self.max_hills})")
        self.centers[self.n_hills] = float(cv_value_bohr)
        self.n_hills += 1

    def cv(self, coords):
        return _dist(coords[self.pair[0]], coords[self.pair[1]])

    def energy(self, coords, params):
        # params carries the (padded) hill centers + count so the jitted
        # energy changes without retracing
        centers, n = params[:-1], params[-1]
        cv = self.cv(coords)
        mask = jnp.arange(self.max_hills) < n
        hills = self.height * jnp.exp(-(cv - centers) ** 2 /
                                      (2.0 * self.width ** 2))
        return jnp.sum(jnp.where(mask, hills, 0.0))

    def init_params(self):
        return np.concatenate([self.centers,
                               np.array([float(self.n_hills)])])
