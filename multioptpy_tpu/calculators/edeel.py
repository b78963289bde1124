"""EDEEL — diabatic electron-transfer states from energy decomposition.

ref: multioptpy/optimization.py:984 EDEELHandler (10.1039/D3RA05784D,
marked "under construction" in the reference): reactant (V11 = D/A in their
initial oxidation states) and product (V22 = after electron transfer)
diabatic surfaces are assembled from fragment calculations; the seam of
crossing (SX) is located by the penalty target

    E_sx = (V11 + V22)/2 + sigma (V11 - V22)^2.

Here the donor/acceptor fragments are evaluated with the SAME backend at
fragment charges for both oxidation states; since every piece is a traceable
calculator call, all gradients are autodiff.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.base import Calculator


class EDEELCalculator(Calculator):
    """target: 'reactant' (V11) | 'product' (V22) | 'sx' (seam penalty).

    charges: dict with keys d_init, a_init, d_final, a_final (fragment
    charges before/after the electron hop). multiplicities analogous
    (default closed-shell 1 everywhere; the on-device SQM uses Fermi
    smearing, so open shells are handled by fractional occupations).
    """

    def __init__(self, calc_factory, donor_atoms, acceptor_atoms, charges,
                 multiplicities=None, target="sx", sigma=2.0, **kw):
        super().__init__(**kw)
        self.donor = np.asarray([a - 1 for a in donor_atoms], np.int32)
        self.acceptor = np.asarray([a - 1 for a in acceptor_atoms], np.int32)
        mult = multiplicities or {}
        self.calcs = {
            "d_init": calc_factory(charge=charges["d_init"],
                                   multiplicity=mult.get("d_init", 1)),
            "a_init": calc_factory(charge=charges["a_init"],
                                   multiplicity=mult.get("a_init", 1)),
            "d_final": calc_factory(charge=charges["d_final"],
                                    multiplicity=mult.get("d_final", 1)),
            "a_final": calc_factory(charge=charges["a_final"],
                                    multiplicity=mult.get("a_final", 1)),
        }
        self.target = target
        self.sigma = float(sigma)
        self.on_device = all(c.on_device for c in self.calcs.values())

    def _fragments(self, coords, z):
        z = np.asarray(z)
        return ((coords[self.donor], jnp.asarray(z[self.donor])),
                (coords[self.acceptor], jnp.asarray(z[self.acceptor])))

    def diabatic_energies(self, coords, z):
        (xd, zd), (xa, za) = self._fragments(coords, z)
        v11 = self.calcs["d_init"].energy(xd, zd) \
            + self.calcs["a_init"].energy(xa, za)
        v22 = self.calcs["d_final"].energy(xd, zd) \
            + self.calcs["a_final"].energy(xa, za)
        return v11, v22

    def energy(self, coords, z):
        v11, v22 = self.diabatic_energies(coords, z)
        if self.target == "reactant":
            return v11
        if self.target == "product":
            return v22
        return 0.5 * (v11 + v22) + self.sigma * (v11 - v22) ** 2
