"""Effective-medium-theory potential for FCC metals — pure JAX.

Same model as ASE's EMT (and the reference's in-house copy,
ref: multioptpy/Calculator/emt_calculation_tools.py:14-264): Jacobsen,
Stoltze, Norskov, Surf. Sci. 366 (1996) 394. Parameters for the 7 fcc
metals plus the toy H/C/N/O set. Implemented as a dense (N,N) pairwise
formulation so it jits, vmaps, and autodiffs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.base import Calculator, register_calculator
from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM, HARTREE2EV

# Z -> (E0 [eV], s0 [bohr], V0 [eV], eta2 [1/bohr], kappa [1/bohr],
#        lambda [1/bohr], n0 [1/bohr^3])   (ASE EMT defaults)
_EMT_PARAMS = {
    13: (-3.28, 3.00, 1.493, 1.240, 2.000, 1.169, 0.00700),  # Al
    29: (-3.51, 2.67, 2.476, 1.652, 2.740, 1.906, 0.00910),  # Cu
    47: (-2.96, 3.01, 2.132, 1.652, 2.790, 1.892, 0.00547),  # Ag
    79: (-3.80, 3.00, 2.321, 1.674, 2.873, 2.182, 0.00703),  # Au
    28: (-4.44, 2.60, 3.673, 1.669, 2.757, 1.948, 0.01030),  # Ni
    46: (-3.90, 2.87, 2.773, 1.818, 3.107, 2.155, 0.00688),  # Pd
    78: (-5.85, 2.90, 4.067, 1.812, 3.145, 2.192, 0.00802),  # Pt
    # toy parameters (ASE: "not real EMT")
    1: (-3.21, 1.31, 0.132, 2.652, 2.790, 3.892, 0.00547),   # H
    6: (-3.50, 1.81, 0.332, 1.652, 2.790, 1.892, 0.01322),   # C
    7: (-5.10, 1.88, 0.132, 1.652, 2.790, 1.892, 0.01222),   # N
    8: (-4.60, 1.95, 0.332, 1.652, 2.790, 1.892, 0.00850),   # O
}

_BETA = 1.809  # (16 pi/3)^(1/3) / sqrt(2)

# ASE's default (asap_cutoff=False) derives the cutoff from the LARGEST s0
# in the whole parameter table — a global constant, not a property of the
# atoms present (ref: emt_calculation_tools.py:103-110 _calc_cutoff with
# relevant_pars = PARAMETERS). Ag's s0 = 3.01 bohr is the max.
_S0_MAX_BOHR = max(p[1] for p in _EMT_PARAMS.values())


def _param_arrays(dtype=np.float64):
    maxz = 87
    out = np.zeros((maxz, 7), dtype=dtype)
    for z, p in _EMT_PARAMS.items():
        out[z] = p
    return out


@register_calculator("emt")
class EMT(Calculator):
    """EMT energy in Hartree on Bohr coordinates; supports the elements in
    `_EMT_PARAMS` (others raise at trace time via a nan guard in tests)."""

    on_device = True

    def energy(self, coords, z):
        dtype = coords.dtype
        par = jnp.asarray(_param_arrays(), dtype=dtype)[z]  # (N,7)
        e0, s0, v0, eta2, kappa, lam, n0 = [par[:, i] for i in range(7)]

        n = coords.shape[0]
        # EMT works in Angstrom/eV internally (parameter units); convert.
        pos = coords * BOHR2ANGSTROM
        # s0 etc. are per-bohr units in ASE tables; ASE multiplies by
        # Bohr (0.5292) to convert. Keep everything in Angstrom:
        s0_a = s0 * BOHR2ANGSTROM
        eta2_a = eta2 * ANGSTROM2BOHR
        kappa_a = kappa * ANGSTROM2BOHR
        lam_a = lam * ANGSTROM2BOHR

        # cutoff: rc midway between 3rd and 4th fcc shell of the table-wide
        # largest s0 (ASE/reference convention — constant, NOT the max over
        # atoms present), smoothing width set so theta(r4nn) = 1e-4
        # (ref: emt_calculation_tools.py:100-117)
        r1nn = _BETA * _S0_MAX_BOHR * BOHR2ANGSTROM
        rc = r1nn * 0.5 * (jnp.sqrt(3.0) + 2.0)
        r4nn = r1nn * 2.0
        acut = jnp.log(9999.0) / (r4nn - rc)

        diff = pos[:, None, :] - pos[None, :, :]
        r2 = jnp.sum(diff * diff, axis=-1)
        offdiag = ~jnp.eye(n, dtype=bool)
        r = jnp.sqrt(jnp.where(offdiag, r2, 1.0))

        # smooth cutoff theta = sigmoid(-acut (r - rc)); jax.nn.sigmoid is
        # overflow-safe so gradients stay finite far outside the cutoff
        # (ref: emt_calculation_tools.py:202 _calc_theta)
        w = jax.nn.sigmoid(-acut * (r - rc))
        w = jnp.where(offdiag, w, 0.0)

        # gamma normalization over fcc shells (3 shells, 12/6/24 atoms)
        shell_d = jnp.stack([_BETA * s0_a,
                             _BETA * s0_a * jnp.sqrt(2.0),
                             _BETA * s0_a * jnp.sqrt(3.0)])  # (3,N)
        # shell occupations are normalized by the first-shell count
        # (x = n w / 12, ref: emt_calculation_tools.py:122 _calc_gammas)
        shell_n = jnp.array([12.0, 6.0, 24.0], dtype=dtype)[:, None] / 12.0
        tw = jax.nn.sigmoid(-acut * (shell_d - rc))
        gamma1 = jnp.sum(shell_n * tw * jnp.exp(-eta2_a[None, :] * (shell_d - _BETA * s0_a[None, :])), axis=0)
        gamma2 = jnp.sum(shell_n * tw * jnp.exp(-kappa_a[None, :] / _BETA * (shell_d - _BETA * s0_a[None, :])), axis=0)

        # pair contributions (self-density from j at i)
        sig1_terms = w * jnp.exp(-eta2_a[None, :] * (r - _BETA * s0_a[None, :]))
        sig2_terms = w * jnp.exp(-kappa_a[None, :] / _BETA * (r - _BETA * s0_a[None, :]))
        # chi_ij = n0_j / n0_i weight for unlike species
        chi = n0[None, :] / n0[:, None]
        sigma1 = jnp.sum(jnp.where(offdiag, sig1_terms * chi, 0.0), axis=1)
        sigma2 = jnp.sum(jnp.where(offdiag, sig2_terms * chi, 0.0), axis=1)

        # E = sum_i [Ec_i + E_AS_i] with gamma-normalized densities
        sigma1 = jnp.maximum(sigma1, 1e-9)
        ds = -jnp.log(sigma1 / gamma1 / 12.0) / (_BETA * eta2_a)
        lam_ds = lam_a * ds
        e_c = e0 * (1.0 + lam_ds) * jnp.exp(-lam_ds) - e0  # 0 at ds=0
        e_as = 6.0 * v0 * jnp.exp(-kappa_a * ds) - 0.5 * v0 * sigma2 / gamma2

        e_ev = jnp.sum(e_c + e_as)
        return e_ev / HARTREE2EV  # eV -> Hartree
