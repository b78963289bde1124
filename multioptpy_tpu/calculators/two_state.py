"""Two-state model functions as composite calculators.

ref: multioptpy/ModelFunction/*.py + the ModelFunctionHandler that feeds them
(ref: optimization.py:345, BITSS 2N-atom expansion :1656-1688). Because a
model function combines two potential-energy surfaces into one scalar, each
is simply a `Calculator` wrapping two state calculators — the whole
optimization stack (RS-RFO, constraints, batching, sharding) works on them
unchanged, and the gradients the reference assembles by hand
(e.g. the MECI penalty gradient) fall out of `jax.grad`.

Model functions (state energies E1(x), E2(x)):
  seam       0.5 (E1+E2) + (E1-E2)^2 / alpha
             (ref: seam_model_function.py:11)
  avoiding   0.5 (E1+E2) + 0.5 sqrt((E1-E2)^2 + 4 U)
             (ref: avoiding_model_function.py:11)
  conical    0.5 (E1+E2) + sigma dE^2 / (|dE| + alpha)
             (ref: conical_model_function.py:14)
  meci       0.5 (E1+E2) + penalty sigma dE^2/(|dE|+alpha) — a penalty-
             function MECI objective (the reference's OptMECI instead uses
             branching-plane gradient projection, opt_meci.py:3; the
             penalty form converges to the same MECI)
  mesx       0.5 (E1+E2) + kappa dE^2 (quadratic seam penalty;
             ref: opt_mesx.py gradient-projection equivalent)
  mesx2      gradient-projection MESX (ref: opt_mesx_2.py, the corrected
             GP of Theor Chem Acc 99, 95 (1998) / JACS 137, 3433 (2015)):
             energy = 0.5 (E1+E2); the FORCE is composed, not a gradient
             of any scalar — 2(E1-E2) v + (I - v v^T) g_mean with
             v = (g1-g2)/|g1-g2| — so energy_and_gradient/hessian are
             overridden instead of autodiffed

BITSS (binary-image TS search, ref: binary_image_ts_search_model_function.py)
couples TWO geometries: `BITSSCalculator` acts on a 2N-atom super-system
(the reference's 2N expansion, optimization.py:1656).
"""

import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.calculators.base import Calculator, register_calculator


class TwoStateModelFunction(Calculator):
    """Combine two calculators' surfaces with a model function.

    calc_1 / calc_2: Calculator instances (e.g. different spin states or
    excited states of host backends, or test surfaces).
    """

    on_device = True

    def __init__(self, calc_1, calc_2, kind="seam", alpha=0.02, sigma=3.5,
                 coupling=1e-3, kappa=10.0, **kw):
        super().__init__(**kw)
        self.calc_1 = calc_1
        self.calc_2 = calc_2
        self.kind = kind
        self.alpha = float(alpha)
        self.sigma = float(sigma)
        self.coupling = float(coupling)
        self.kappa = float(kappa)
        self.on_device = calc_1.on_device and calc_2.on_device

    def energy(self, coords, z):
        e1 = self.calc_1.energy(coords, z)
        e2 = self.calc_2.energy(coords, z)
        de = e1 - e2
        mean = 0.5 * (e1 + e2)
        if self.kind == "seam":
            return mean + de ** 2 / self.alpha
        if self.kind == "avoiding":
            return mean + 0.5 * jnp.sqrt(de ** 2 + 4.0 * self.coupling)
        if self.kind in ("conical", "meci"):
            return mean + self.sigma * de ** 2 / (jnp.abs(de) + self.alpha)
        if self.kind == "mesx":
            return mean + self.kappa * de ** 2
        if self.kind == "mesx2":
            # GP method: the objective tracked is the mean energy; descent
            # comes from the composed force below (ref: opt_mesx_2.py:11)
            return mean
        raise ValueError(f"unknown model function '{self.kind}'")

    @staticmethod
    def _gp_vector(g1, g2):
        dg = (g1 - g2).reshape(-1)
        nrm = jnp.linalg.norm(dg)
        return jnp.where(nrm > 1e-8, dg / jnp.maximum(nrm, 1e-30),
                         jnp.zeros_like(dg))

    def energy_and_gradient(self, coords, z):
        if self.kind != "mesx2":
            return super().energy_and_gradient(coords, z)
        # composed GP force (ref: opt_mesx_2.py:18-45): gap restoration
        # along the difference-gradient vector + seam force in its
        # orthogonal complement
        e1, g1 = self.calc_1.energy_and_gradient(coords, z)
        e2, g2 = self.calc_2.energy_and_gradient(coords, z)
        v = self._gp_vector(g1, g2)
        g_mean = (0.5 * (g1 + g2)).reshape(-1)
        gp = 2.0 * (e1 - e2) * v + (g_mean - v * (v @ g_mean))
        return 0.5 * (e1 + e2), gp.reshape(coords.shape)

    def hessian(self, coords, z):
        if self.kind != "mesx2":
            return super().hessian(coords, z)
        # P H_mean P + 2 v v^T (ref: opt_mesx_2.py:47-65)
        g1 = self.calc_1.gradient(coords, z)
        g2 = self.calc_2.gradient(coords, z)
        v = self._gp_vector(g1, g2)
        h_mean = 0.5 * (self.calc_1.hessian(coords, z)
                        + self.calc_2.hessian(coords, z))
        hv = h_mean @ v
        p_h_p = (h_mean - jnp.outer(v, hv) - jnp.outer(hv, v)
                 + jnp.outer(v, v) * (v @ hv))
        return p_h_p + 2.0 * jnp.outer(v, v)

    def gap(self, coords, z):
        return self.calc_1.energy(coords, z) - self.calc_2.energy(coords, z)


class BITSSCalculator(Calculator):
    """Binary-image TS search on a 2N-atom super-system
    (ref: binary_image_ts_search_model_function.py:28, 2N expansion
    optimization.py:1656-1688).

    E(x1, x2) = E(x1) + E(x2) + kappa_e (E1-E2)^2 + kappa_d (|x1-x2| - d)^2

    The target distance d contracts by `shrink` per `contract()` call; the
    driver calls contract() between optimize() stages (the reference does it
    every 500 inner iterations).
    """

    on_device = True

    def __init__(self, calc, n_atoms, kappa_e=10.0, kappa_d=1.0, d0=None,
                 shrink=0.5, **kw):
        super().__init__(**kw)
        self.calc = calc
        self.n_atoms = int(n_atoms)
        self.kappa_e = float(kappa_e)
        self.kappa_d = float(kappa_d)
        self.d_target = d0
        self.shrink = float(shrink)
        self.on_device = calc.on_device

    @staticmethod
    def pack(coords_1, coords_2):
        return jnp.concatenate([coords_1, coords_2], axis=0)

    def unpack(self, coords):
        return coords[: self.n_atoms], coords[self.n_atoms:]

    def pack_z(self, z):
        z = jnp.asarray(z)
        return jnp.concatenate([z, z])

    def contract(self, coords):
        """Shrink the pair-distance target (ref: self.d update, BITSS :55)."""
        x1, x2 = self.unpack(coords)
        current = float(jnp.linalg.norm(x1 - x2))
        base = current if self.d_target is None else min(self.d_target, current)
        self.d_target = max((1.0 - self.shrink) * base, 1e-6)
        return self.d_target

    def update_kappas(self, coords, z, alpha=10.0, beta=0.02):
        """Adaptive constraint strengths (BITSS eq. 4-5;
        ref: binary_image_ts_search_model_function.py:33-50):
        kappa_e = alpha / (2 E_B), kappa_d = max(|grad_proj| / (2^1.5 beta d),
        E_B / (beta d^2))."""
        x1, x2 = self.unpack(jnp.asarray(coords))
        z1 = jnp.asarray(z)[: self.n_atoms]
        e1, g1 = self.calc.energy_and_gradient(x1, z1)
        e2, g2 = self.calc.energy_and_gradient(x2, z1)
        diff = x1 - x2
        dist = float(jnp.linalg.norm(diff)) + 1e-10
        unit = diff / dist
        e_b = abs(float(e1 - e2)) + 1e-10
        # floor E_B at a fraction of its initial value: the raw reference
        # formula sends kappa_e -> inf as the images equalize, which makes
        # the (E1-E2)^2 ravine unintegrable and throws the pair off the
        # surface on meV-scale model potentials
        if not hasattr(self, "_e_b0") or self._e_b0 is None:
            self._e_b0 = e_b
        e_b = max(e_b, 0.05 * self._e_b0)
        proj1 = float(jnp.sum(g1 * (-unit)))
        proj2 = float(jnp.sum(g2 * unit))
        grad_term = np.sqrt(proj1 ** 2 + proj2 ** 2)
        self.kappa_e = alpha / (2.0 * e_b)
        self.kappa_d = max(grad_term / (2.0 ** 1.5 * beta * dist + 1e-10),
                           e_b / (beta * dist ** 2 + 1e-10))
        return self.kappa_e, self.kappa_d

    def energy(self, coords, z):
        x1, x2 = self.unpack(coords)
        z1 = jnp.asarray(z)[: self.n_atoms]
        e1 = self.calc.energy(x1, z1)
        e2 = self.calc.energy(x2, z1)
        dist = jnp.sqrt(jnp.sum((x1 - x2) ** 2) + 1e-14)
        d_tgt = self.d_target if self.d_target is not None else dist
        return (e1 + e2 + self.kappa_e * (e1 - e2) ** 2
                + self.kappa_d * (dist - d_tgt) ** 2)


def bitss_search(calc, coords_a, coords_b, z, n_stages=8, opt_config=None,
                 kappa_e=50.0, kappa_d=2.0, shrink=0.4):
    """Full BITSS loop: alternate distance contraction and pair relaxation
    until the images meet at the saddle region. Returns (ts_guess, energy)."""
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    opt_config = opt_config or OptimizeConfig(
        method="fire", nsteps=150, max_force=1e-5, rms_force=7e-6,
        project_tr_rot=False)
    n = coords_a.shape[0]
    bitss = BITSSCalculator(calc, n, kappa_e=kappa_e, kappa_d=kappa_d,
                            shrink=shrink)
    coords = BITSSCalculator.pack(jnp.asarray(coords_a), jnp.asarray(coords_b))
    zz = bitss.pack_z(z)
    for _ in range(n_stages):
        bitss.update_kappas(coords, z)
        bitss.contract(coords)
        res = optimize(bitss, coords, zz, config=opt_config)
        coords = res.coords
    x1, x2 = bitss.unpack(coords)
    mid = 0.5 * (x1 + x2)
    e_mid = float(calc.energy(mid, jnp.asarray(z)))
    return mid, e_mid


def optimize_model_function(calc_1, calc_2, coords, z, kind="seam",
                            opt_config=None, **mf_kwargs):
    """Driver preset for 2-PES objectives (ref: OtherMethod/modelfunction.py
    ModelFunctionOptimizer + ModelFunctionHandler, optimization.py:345):
    build the model-function calculator and minimize it. Returns
    (OptResult, TwoStateModelFunction) so the caller can inspect the gap."""
    from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

    mf = TwoStateModelFunction(calc_1, calc_2, kind=kind, **mf_kwargs)
    opt_config = opt_config or OptimizeConfig(
        method="rfo_fsb", nsteps=200,
        fc_count=5 if mf.on_device else -1, project_tr_rot=False)
    res = optimize(mf, coords, z, config=opt_config)
    return res, mf
