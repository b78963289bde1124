"""AFIR — artificial force induced reaction potential.

Same model chemistry as the reference (ref: multioptpy/Potential/
AFIR_potential.py:7-56; Maeda et al., Chem. Rec. 16 (2016) 2232): a weighted
mean fragment-pair distance is biased with strength alpha derived from the
model collision energy gamma via the Ar-Ar SC-AFIR calibration
(R0 = 3.8164 A, epsilon = 1.0061 kJ/mol).

    omega_ij = ((R_i + R_j) / r_ij)^6
    E = alpha * sum(omega r) / sum(omega)

params[0] = gamma (kJ/mol) — differentiable, so dE/dgamma is exact.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.periodic import COVALENT_RADII_1
from multioptpy_tpu.potentials.base import BiasPotential, idx0, register_potential
from multioptpy_tpu.units import ANGSTROM2BOHR, HARTREE2KJMOL

_R0_BOHR = 3.8164 * ANGSTROM2BOHR
_EPS_HARTREE = 1.0061 / HARTREE2KJMOL
_P = 6.0


def afir_alpha(gamma_kjmol):
    """gamma (kJ/mol, traced) -> alpha (Hartree/Bohr).
    ref: AFIR_potential.py:33-35."""
    g = gamma_kjmol / HARTREE2KJMOL
    denom = (2.0 ** (-1.0 / 6.0)
             - (1.0 + jnp.sqrt(1.0 + jnp.abs(g) / _EPS_HARTREE)) ** (-1.0 / 6.0)
             ) * _R0_BOHR
    return jnp.where(gamma_kjmol != 0.0, g / denom, 0.0)


@register_potential
class AFIRPotential(BiasPotential):
    """config: gamma (kJ/mol), fragm_1 / fragm_2 (1-based atom lists),
    element_z (full-molecule atomic numbers array)."""

    name = "afir"

    def __init__(self, gamma, fragm_1, fragm_2, element_z, **kw):
        super().__init__(**kw)
        self.gamma = float(gamma)
        self.i_idx = idx0(fragm_1)
        self.j_idx = idx0(fragm_2)
        z = np.asarray(element_z)
        self.r_i = np.asarray(COVALENT_RADII_1)[z[self.i_idx]]  # Bohr
        self.r_j = np.asarray(COVALENT_RADII_1)[z[self.j_idx]]

    def init_params(self):
        return np.array([self.gamma], dtype=np.float64)

    def energy(self, coords, params):
        alpha = afir_alpha(params[0])
        ri = jnp.asarray(self.r_i, dtype=coords.dtype)
        rj = jnp.asarray(self.r_j, dtype=coords.dtype)
        diff = coords[self.i_idx][:, None, :] - coords[self.j_idx][None, :, :]
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # (M, K)
        omega = ((ri[:, None] + rj[None, :]) / r) ** _P
        return alpha * jnp.sum(omega * r) / jnp.sum(omega)
