"""UFF Lennard-Jones test potential — pure JAX, fully on-device.

Same physics as the reference's analytic LJ backend
(ref: multioptpy/Calculator/lj_calculation_tools.py:36-91): per-element UFF
vdW parameters, Lorentz-Berthelot combining (arithmetic sigma, geometric
epsilon), full N^2 pair sum. Runs entirely on TPU; gradients/Hessians via
autodiff; the primary dependency-free end-to-end test backend.
"""

import jax.numpy as jnp

from multioptpy_tpu.calculators.base import Calculator, register_calculator
from multioptpy_tpu.periodic import UFF_VDW_EPS, UFF_VDW_R

_SIGMA_FROM_RMIN = 2.0 ** (-1.0 / 6.0)


@register_calculator("lj")
class LennardJones(Calculator):
    on_device = True

    def energy(self, coords, z):
        dtype = coords.dtype
        sigma_i = (jnp.asarray(UFF_VDW_R, dtype=dtype) * _SIGMA_FROM_RMIN)[z]
        eps_i = jnp.asarray(UFF_VDW_EPS, dtype=dtype)[z]

        n = coords.shape[0]
        diff = coords[:, None, :] - coords[None, :, :]
        r2 = jnp.sum(diff * diff, axis=-1)
        mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
        r2 = jnp.where(mask, r2, 1.0)  # keep grads finite off the mask

        sigma_ab = 0.5 * (sigma_i[:, None] + sigma_i[None, :])
        eps_ab = jnp.sqrt(eps_i[:, None] * eps_i[None, :])
        s2 = sigma_ab * sigma_ab / r2
        s6 = s2 * s2 * s2
        s12 = s6 * s6
        e_pair = 4.0 * eps_ab * (s12 - s6)
        return jnp.sum(jnp.where(mask, e_pair, 0.0))
