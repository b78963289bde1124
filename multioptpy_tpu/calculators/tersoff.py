"""Tersoff bond-order potential (Si/C/Ge) — pure JAX, dense three-body form.

Same model as the reference's analytic Tersoff backend
(ref: multioptpy/Calculator/tersoff_calculation_tools.py:16-654): Tersoff,
PRB 39 (1989) 5566 parameters. The three-body bond-order term is computed as
a dense (N,N,N) tensor (fine for molecular N; fully jit/vmap/autodiff-able).
Energy in Hartree, coordinates in Bohr.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.base import Calculator, register_calculator
from multioptpy_tpu.units import ANGSTROM2BOHR, BOHR2ANGSTROM, HARTREE2EV

# Z -> (A[eV], B[eV], lambda1[1/A], lambda2[1/A], lambda3[1/A],
#        beta, n, c, d, h, R[A], D[A])  (Tersoff PRB 39, 5566 (1989))
_TERSOFF = {
    6:  (1393.6, 346.74, 3.4879, 2.2119, 0.0, 1.5724e-7, 0.72751,
         38049.0, 4.3484, -0.57058, 1.95, 0.15),
    14: (1830.8, 471.18, 2.4799, 1.7322, 0.0, 1.1e-6, 0.78734,
         100390.0, 16.217, -0.59825, 2.85, 0.15),
    32: (1769.0, 419.23, 2.4451, 1.7047, 0.0, 9.0166e-7, 0.75627,
         106430.0, 15.652, -0.43884, 2.95, 0.15),
}


def _param_arrays():
    maxz = 87
    out = np.zeros((maxz, 12), dtype=np.float64)
    for z, p in _TERSOFF.items():
        out[z] = p
    return out


@register_calculator("tersoff")
class Tersoff(Calculator):
    on_device = True

    def energy(self, coords, z):
        dtype = coords.dtype
        par = jnp.asarray(_param_arrays(), dtype=dtype)[z]  # (N,12)
        A, B, lam1, lam2, lam3, beta, nn, c, d, h, R, D = [par[:, i] for i in range(12)]

        n = coords.shape[0]
        pos = coords * BOHR2ANGSTROM  # parameters are in Angstrom/eV
        diff = pos[:, None, :] - pos[None, :, :]  # (N,N,3) r_i - r_j
        offdiag = ~jnp.eye(n, dtype=bool)
        r2 = jnp.sum(diff * diff, axis=-1)
        r = jnp.sqrt(jnp.where(offdiag, r2, 1.0))

        # mixed parameters (geometric mean for unlike pairs, Tersoff 1989)
        A_ij = jnp.sqrt(A[:, None] * A[None, :])
        B_ij = jnp.sqrt(B[:, None] * B[None, :])
        lam1_ij = 0.5 * (lam1[:, None] + lam1[None, :])
        lam2_ij = 0.5 * (lam2[:, None] + lam2[None, :])
        R_ij = jnp.sqrt(R[:, None] * R[None, :])
        D_ij = jnp.sqrt(D[:, None] * D[None, :])

        # smooth cutoff (ref: tersoff_calculation_tools.py:161)
        def fc(rr, Rc, Dc):
            x = (rr - Rc) / jnp.maximum(Dc, 1e-12)
            inner = rr < (Rc - Dc)
            outer = rr > (Rc + Dc)
            mid = 0.5 - 0.5 * jnp.sin(0.5 * jnp.pi * x)
            return jnp.where(inner, 1.0, jnp.where(outer, 0.0, mid))

        fc_ij = jnp.where(offdiag, fc(r, R_ij, D_ij), 0.0)

        # angular g(theta) over triplets (i, j, k): cos(theta_jik)
        rij = diff  # vector i->j is pos_j - pos_i = -diff; use consistent sign
        # cos theta between bonds i->j and i->k
        dot = jnp.einsum("ijx,ikx->ijk", -diff, -diff)
        cos_t = dot / (r[:, :, None] * r[:, None, :])
        g = (1.0 + (c / d)[:, None, None] ** 2
             - c[:, None, None] ** 2 / (d[:, None, None] ** 2 +
                                        (h[:, None, None] - cos_t) ** 2))

        # zeta_ij = sum_{k != i,j} fc(r_ik) g(theta_ijk) exp(lam3^3 (r_ij - r_ik)^3)
        lam3_i = lam3[:, None, None]
        expo = jnp.exp(lam3_i ** 3 * (r[:, :, None] - r[:, None, :]) ** 3)
        mask3 = (offdiag[:, :, None] & offdiag[:, None, :] &
                 ~jnp.eye(n, dtype=bool)[None, :, :])
        zeta = jnp.sum(jnp.where(mask3, fc_ij[:, None, :] * g * expo, 0.0), axis=2)

        beta_i = beta[:, None]
        # unparameterized elements have n = 0; their pair terms are already
        # zero through A_ij/B_ij, so guard the exponent against 1/0 -> NaN
        n_i = jnp.where(nn[:, None] > 1e-6, nn[:, None], 1.0)
        bz = jnp.maximum(beta_i * zeta, 1e-30)
        b_ij = (1.0 + bz ** n_i) ** (-0.5 / n_i)

        f_r = A_ij * jnp.exp(-lam1_ij * r)
        f_a = -B_ij * jnp.exp(-lam2_ij * r)
        e_pair = fc_ij * (f_r + b_ij * f_a)
        e_ev = 0.5 * jnp.sum(jnp.where(offdiag, e_pair, 0.0))
        return e_ev / HARTREE2EV
