"""Differentiable D2 dispersion: energy + autodiff Hessian corrections.

ref: multioptpy/Parameters/d2.py (Grimme JCC 27 (2006) 1787 tables, H-Rn) and
the dispersion-corrected model Hessians lindh2007d{2,3,4} / fischerd3 /
swartd4 etc. (ModelHessian/*.py, 500-1000 LoC each of hand-written second
derivatives). Here the dispersion Hessian is `jax.hessian` of the 10-line
closed-form energy — exact, and the same code serves every model-Hessian
flavor.

E_D2 = -s6 sum_{i<j} C6_ij / r^6 * f_damp,  f_damp = 1/(1+exp(-d(r/R0-1))),
C6_ij = sqrt(C6_i C6_j). D3/D4 upgrades (CN-dependent C6) are round-2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.units import ANGSTROM2BOHR

# Z-indexed (0..86): Grimme D2 C6 (J nm^6 / mol) and vdW radii (Angstrom)
D2_C6_JNM6 = np.array([
    0, 0.14, 0.08, 1.61, 1.61, 3.13, 1.75, 1.23,
    0.7, 0.75, 0.63, 5.71, 5.71, 10.79, 9.23, 7.84,
    5.57, 5.07, 4.61, 10.8, 10.8, 10.8, 10.8, 10.8,
    10.8, 10.8, 10.8, 10.8, 10.8, 10.8, 10.8, 16.99,
    17.1, 16.37, 12.64, 12.47, 12.01, 24.67, 24.67, 24.67,
    24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 24.67,
    24.67, 37.32, 38.71, 38.44, 31.74, 31.5, 29.99, 50,
    50, 50, 50, 50, 50, 50, 50, 50,
    50, 50, 50, 50, 50, 50, 50, 50,
    50, 50, 50, 50, 50, 50, 50, 50,
    50, 50, 50, 50, 50, 50, 50,
], dtype=np.float64)

D2_VDW_ANG = np.array([
    1, 1.001, 1.012, 0.825, 1.408, 1.485, 1.452, 1.397,
    1.342, 1.287, 1.243, 1.144, 1.364, 1.639, 1.716, 1.705,
    1.683, 1.639, 1.595, 1.485, 1.474, 1.562, 1.562, 1.562,
    1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.65,
    1.727, 1.76, 1.771, 1.749, 1.727, 1.628, 1.606, 1.639,
    1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.639,
    1.639, 1.672, 1.804, 1.881, 1.892, 1.892, 1.881, 1.802,
    1.762, 1.72, 1.753, 1.753, 1.753, 1.753, 1.753, 1.753,
    1.753, 1.753, 1.753, 1.753, 1.753, 1.753, 1.753, 1.753,
    1.788, 1.772, 1.772, 1.772, 1.772, 1.772, 1.772, 1.772,
    1.758, 1.989, 1.944, 1.898, 2.005, 1.991, 1.924,
], dtype=np.float64)

# J nm^6/mol -> Hartree Bohr^6
_C6_AU = D2_C6_JNM6 / 6.02214076e23 / 4.3597447222071e-18 / 0.052917721067 ** 6


def d2_energy(coords, z, s6=1.2, damping=20.0):
    """Grimme D2 dispersion energy (Hartree, coords in Bohr)."""
    z = np.asarray(z)
    n = len(z)
    c6 = jnp.asarray(_C6_AU[z], coords.dtype)
    r0 = jnp.asarray(D2_VDW_ANG[z] * ANGSTROM2BOHR, coords.dtype)
    diff = coords[:, None, :] - coords[None, :, :]
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1)
                 + jnp.eye(n, dtype=coords.dtype))
    c6_ij = jnp.sqrt(c6[:, None] * c6[None, :])
    r0_ij = r0[:, None] + r0[None, :]
    f = 1.0 / (1.0 + jnp.exp(-damping * (r / r0_ij - 1.0)))
    e = -s6 * c6_ij / r ** 6 * f
    return jnp.sum(jnp.where(mask, e, 0.0))


def d2_gradient(coords, z, s6=1.2):
    return jax.grad(d2_energy)(coords, z, s6)


def d2_hessian(coords, z, s6=1.2):
    """(3N,3N) exact dispersion Hessian via autodiff (replaces the
    reference's hand-derived per-pair second-derivative blocks)."""
    n = coords.shape[0]
    flat = lambda x: d2_energy(x.reshape(n, 3), z, s6)
    return jax.hessian(flat)(coords.reshape(-1))
