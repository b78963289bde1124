"""Molecular-orbital analysis: natural reaction orbitals and SQM MO access.

ref: multioptpy/WFAnalyzer/MO_analysis.py:7 NROAnalysis — natural reaction
orbitals from consecutive wavefunctions (Psi4/PySCF only in the reference).
Here the same machinery runs on the on-device SQM backend's orbitals too:
`sqm_orbitals` exposes (eps, C, S, occ) for any geometry, and
`natural_reaction_orbitals` diagonalizes the occupied-block density
difference between two geometries along a reaction path.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Orbitals(NamedTuple):
    energies: np.ndarray     # (M,)
    coefficients: np.ndarray  # (M, M) columns are MOs (S-orthonormal)
    overlap: np.ndarray      # (M, M)
    occupations: np.ndarray  # (M,)


def sqm_orbitals(calc, coords, z):
    """Solve the SQM EHT problem once and return the orbitals."""
    from jax.scipy.linalg import cholesky, solve_triangular

    from multioptpy_tpu.calculators import sqm as S

    z_np = np.asarray(z)
    n = len(z_np)
    coords = jnp.asarray(coords)
    alpha, cs, cp = S._primitive_params(z_np)
    s_blocks = S._overlap_blocks(coords, jnp.asarray(alpha), jnp.asarray(cs),
                                 jnp.asarray(cp))
    h_diag_atom = np.stack([S._T["h_s"][z_np], S._T["h_p"][z_np],
                            S._T["h_p"][z_np], S._T["h_p"][z_np]], axis=1) \
        / 27.211396127707
    h_diag = jnp.asarray(h_diag_atom).reshape(-1)
    s_mat = jnp.transpose(s_blocks, (0, 2, 1, 3)).reshape(4 * n, 4 * n)
    diag_mask = jnp.kron(jnp.eye(n), jnp.ones((4, 4)))
    s_mat = s_mat * (1 - diag_mask) + jnp.kron(jnp.eye(n), jnp.eye(4))
    valid_atom = np.stack([np.ones(n), S._T["has_p"][z_np],
                           S._T["has_p"][z_np], S._T["has_p"][z_np]], axis=1)
    valid = jnp.asarray(valid_atom).reshape(-1)
    vv = valid[:, None] * valid[None, :]
    s_mat = s_mat * vv + jnp.diag(1.0 - valid)
    is_p = jnp.asarray(np.tile([0.0, 1.0, 1.0, 1.0], n))
    pp = is_p[:, None] + is_p[None, :]
    k_pair = jnp.where(pp == 0, calc.k_ss,
                       jnp.where(pp == 1, calc.k_sp, calc.k_pp))
    h_mat = 0.5 * k_pair * (h_diag[:, None] + h_diag[None, :]) * s_mat
    h_mat = jnp.where(jnp.eye(4 * n, dtype=bool), h_diag, h_mat * vv)

    l_fac = cholesky(s_mat + 1e-10 * jnp.eye(4 * n), lower=True)
    tmp = solve_triangular(l_fac, h_mat, lower=True)
    h_prime = solve_triangular(l_fac, tmp.T, lower=True).T
    w, y = jnp.linalg.eigh(0.5 * (h_prime + h_prime.T))
    c = solve_triangular(l_fac.T, y, lower=False)

    n_elec = float(np.sum(S._T["n_val"][z_np]) - calc.charge)
    occ, _ = S._fermi_occupations(w, n_elec, calc.kt)
    return Orbitals(energies=np.asarray(w), coefficients=np.asarray(c),
                    overlap=np.asarray(s_mat), occupations=np.asarray(occ))


def density_matrix(orb):
    c_occ = orb.coefficients * orb.occupations[None, :]
    return c_occ @ orb.coefficients.T


def host_orbitals(calc, coords, z):
    """Orbitals from a host-bridge backend's wavefunction (ref: the
    reference's NROAnalysis consumes SP.orbital_coefficients /
    overlap_matrix / orbital_energies from its tblite/Psi4/PySCF
    calculators, WFAnalyzer/MO_analysis.py:66-79). The bridge contract is
    `_host_wavefunction(coords_bohr, z) -> (eps, C, S, occ)` numpy
    arrays; see calculators/host.py."""
    eps, c, s, occ = calc._host_wavefunction(np.asarray(coords),
                                             np.asarray(z))
    return Orbitals(energies=np.asarray(eps), coefficients=np.asarray(c),
                    overlap=np.asarray(s), occupations=np.asarray(occ))


def orbitals_of(calc, coords, z):
    """Dispatch: host-bridge wavefunction when the backend provides one,
    else the on-device SQM orbitals."""
    if hasattr(calc, "_host_wavefunction"):
        return host_orbitals(calc, coords, z)
    return sqm_orbitals(calc, coords, z)


class NROResponse(NamedTuple):
    lambda_singular: np.ndarray   # singular values of the response matrix
    lambda_sum: float             # the reference's per-step LAMBDA scalar
    left: np.ndarray              # left natural reaction orbitals (columns)
    right: np.ndarray             # right NROs (columns)
    d_orbital_energy: np.ndarray   # d eps / d s along the direction
    d2_orbital_energy: np.ndarray  # d2 eps / d s2


def nro_response(orb_0, orb_plus, orb_minus, delta):
    """Natural-reaction-orbital response analysis between displaced
    wavefunctions (ref: MO_analysis.py:80-94, Ebisawa et al. PCCP 24,
    3532 (2022)): the first response matrix M = C0^H S dC/ds (dC from the
    +/-delta central difference) is SVD-decomposed; its singular values
    measure how strongly each orbital rotates along the displacement, and
    the left/right singular vectors are the NRO pairs. Also returns the
    first/second orbital-energy derivatives the reference logs."""
    dc = (orb_plus.coefficients - orb_minus.coefficients) / (2.0 * delta)
    d_eps = (orb_plus.energies - orb_minus.energies) / (2.0 * delta)
    d2_eps = (orb_plus.energies + orb_minus.energies
              - 2.0 * orb_0.energies) / (delta ** 2)
    m = (np.conjugate(orb_0.coefficients.T) @ orb_0.overlap @ dc)
    left, lam, right_h = np.linalg.svd(m)
    return NROResponse(lambda_singular=lam, lambda_sum=float(np.sum(lam)),
                       left=left, right=np.conjugate(right_h.T),
                       d_orbital_energy=d_eps, d2_orbital_energy=d2_eps)


def nro_along(calc, coords, z, direction, delta=1e-4):
    """NRO response at `coords` along `direction` (the reference displaces
    +/- delta * unit(move_vector), MO_analysis.py:68): works on any
    backend `orbitals_of` supports — host wavefunctions included."""
    direction = np.asarray(direction, dtype=np.float64)
    step = delta * direction / (np.linalg.norm(direction) + 1e-300)
    coords = np.asarray(coords, dtype=np.float64)
    orb_0 = orbitals_of(calc, coords, z)
    orb_p = orbitals_of(calc, coords + step, z)
    orb_m = orbitals_of(calc, coords - step, z)
    return nro_response(orb_0, orb_p, orb_m, delta)


def natural_reaction_orbitals(calc, coords_1, coords_2, z):
    """NROs: eigenvectors of the density-difference matrix between two
    points on a reaction path; large |eigenvalue| = orbitals most involved
    in the electronic rearrangement (ref: MO_analysis.py:7).
    Returns (eigenvalues sorted by |.| desc, orbital vectors)."""
    o1 = sqm_orbitals(calc, coords_1, z)
    o2 = sqm_orbitals(calc, coords_2, z)
    dp = density_matrix(o2) - density_matrix(o1)
    # symmetric orthogonalization with the mid-geometry overlap
    s = 0.5 * (o1.overlap + o2.overlap)
    sw, sv = np.linalg.eigh(s)
    s_half = sv @ np.diag(np.sqrt(np.maximum(sw, 1e-12))) @ sv.T
    m = s_half @ dp @ s_half
    w, v = np.linalg.eigh(0.5 * (m + m.T))
    order = np.argsort(-np.abs(w))
    return w[order], v[:, order]
