"""Two-layer ONIOM (QM/QM') composite calculator.

ref: multioptpy/Utils/oniom.py (separate_high_layer_and_low_layer, link
atoms) + ONIOMHandler (optimization.py:597). E_ONIOM = E_low(real) +
E_high(model) - E_low(model); cut bonds are capped with hydrogen link atoms
placed along the bond at a fixed scale factor. Because the link-atom
positions are differentiable functions of the real coordinates, the ONIOM
gradient (including the chain-rule Jacobian the reference assembles by
hand) falls out of `jax.grad`.
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.base import Calculator


class ONIOM(Calculator):
    """high_calc on `high_atoms` (1-based) + link H caps; low_calc on all.

    link_bonds: list of (inner_atom, outer_atom) 1-based pairs cut by the
    layer boundary; a hydrogen is placed at
    r_inner + g (r_outer - r_inner), g = link_scale (default 0.709, the
    standard C-C -> C-H ratio).
    """

    def __init__(self, high_calc, low_calc, high_atoms, link_bonds=(),
                 link_scale=0.709, **kw):
        super().__init__(**kw)
        self.high_calc = high_calc
        self.low_calc = low_calc
        self.high_idx = np.asarray([a - 1 for a in high_atoms], np.int32)
        self.link_bonds = np.asarray(
            [[i - 1, j - 1] for i, j in link_bonds], np.int32).reshape(-1, 2)
        self.link_scale = float(link_scale)
        self.on_device = high_calc.on_device and low_calc.on_device

    def _model_system(self, coords, z):
        """High-layer atoms + H link caps -> (coords_model, z_model)."""
        parts = [coords[self.high_idx]]
        z_model = [np.asarray(z)[self.high_idx]]
        if len(self.link_bonds):
            inner = coords[self.link_bonds[:, 0]]
            outer = coords[self.link_bonds[:, 1]]
            caps = inner + self.link_scale * (outer - inner)
            parts.append(caps)
            z_model.append(np.ones(len(self.link_bonds), dtype=np.int32))
        coords_model = jnp.concatenate(parts, axis=0)
        zm = jnp.asarray(np.concatenate(z_model))
        return coords_model, zm

    def energy(self, coords, z):
        coords_model, z_model = self._model_system(coords, z)
        e_low_real = self.low_calc.energy(coords, z)
        e_high_model = self.high_calc.energy(coords_model, z_model)
        e_low_model = self.low_calc.energy(coords_model, z_model)
        return e_low_real + e_high_model - e_low_model
