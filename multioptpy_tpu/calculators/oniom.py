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


class MicroiterONIOM(ONIOM):
    """ONIOM with low-layer microiterations (ref: optimization.py:716
    ONIOMHandler 'Microiterations on low layer'): before each macro
    energy/gradient evaluation the environment (non-high atoms) FIRE-
    relaxes on the low-level real surface with the high layer frozen, so
    the macro optimizer walks an effective PES whose environment follows
    adiabatically. The whole micro loop is one `lax.scan`, so the macro
    step stays a single compiled program.

    The reference runs up to `-mi` host-side microiterations per macro
    step with its own FIRE instance; here the count is a static scan
    length (default 0 = plain ONIOM).
    """

    def __init__(self, *args, microiter=0, micro_dt=0.3, **kw):
        super().__init__(*args, **kw)
        self.microiter = int(microiter)
        self.micro_dt = float(micro_dt)

    def _relax_env(self, coords, z):
        import jax

        if self.microiter <= 0:
            return coords
        n = coords.shape[0]
        mask = jnp.ones((n, 1), coords.dtype)
        mask = mask.at[jnp.asarray(self.high_idx)].set(0.0)
        grad_low = jax.grad(self.low_calc.energy, argnums=0)

        def body(carry, _):
            x, v, dt = carry
            g = grad_low(x, z) * mask
            power = jnp.sum(-g * v)
            v = jnp.where(power > 0, 0.9 * v - dt * g, -dt * g)
            dt_new = jnp.where(power > 0, jnp.minimum(dt * 1.05, 0.8),
                               dt * 0.5)
            x = x + dt_new * v
            return (x, v, dt_new), None

        (x, _, _), _ = jax.lax.scan(
            body, (coords, jnp.zeros_like(coords),
                   jnp.asarray(self.micro_dt, coords.dtype)),
            None, length=self.microiter)
        return x

    def energy(self, coords, z):
        import jax

        x = self._relax_env(coords, z)
        n = coords.shape[0]
        hi = jnp.zeros((n, 1), dtype=bool).at[
            jnp.asarray(self.high_idx)].set(True)
        # envelope theorem: at the relaxed environment dE/dx_L ~ 0, so the
        # macro gradient only needs the direct x_H dependence — stop the
        # gradient through the micro relaxation instead of differentiating
        # the whole scan
        x = jnp.where(hi, coords, jax.lax.stop_gradient(x))
        return super().energy(x, z)
