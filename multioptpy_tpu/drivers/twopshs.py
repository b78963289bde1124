"""2PSHS — two-point scaled hypersphere search (double-ended TS search).

ref: multioptpy/OtherMethod/twopshs.py:12 (1095 LoC): SHS spheres are grown
from the REACTANT toward the PRODUCT: on each hypersphere (scaled
coordinates, see drivers/addf.py) the energy is minimized subject to staying
on the sphere, seeded by the direction toward the product; the radius grows
until the frontier point's energy turns over — the crossing is the TS
region. Because the sphere center sits at a true minimum, the climbing is
monotone until the saddle.

Shares the scaled-coordinate + on-sphere projected FIRE machinery with
ADDF; differs in the (single, product-directed) seed and the stop rule
based on proximity to the product.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.geometry import project_hessian_tr_rot
# f64-on-TPU routes to the seeded solver; identity elsewhere
from multioptpy_tpu.ops.eigh64 import eigh_fast as _eigh_fast


@dataclasses.dataclass(frozen=True)
class TwoPSHSConfig:
    r_start: float = 0.3
    r_step: float = 0.15
    n_spheres: int = 60
    n_relax: int = 60
    relax_rate: float = 0.2
    eig_floor: float = 1e-4
    product_bias: float = 0.02   # Ha/Bohr^2: harmonic pull toward the
                                 # product during the on-sphere relaxation.
                                 # The two-point method's defining feature
                                 # is product-DIRECTED frontier growth;
                                 # without it the on-sphere minimum slides
                                 # into the lowest anharmonic channel
                                 # (measured on HCN: the Morse-flattened
                                 # C-H dissociation, not the isomerization
                                 # ridge). The recorded energies/turnover
                                 # test use the TRUE energy.


class TwoPSHSResult(NamedTuple):
    path: np.ndarray
    energies: np.ndarray
    ts_guess: np.ndarray
    ts_energy: float
    crossed_ts: bool


def twopshs(calc, reactant, product, z, config=TwoPSHSConfig(),
            bias_engine=None):
    """Grow product-directed SHS spheres from the reactant minimum."""
    reactant = jnp.asarray(reactant)
    product = jnp.asarray(product)
    z = jnp.asarray(z)
    n = reactant.shape[0]
    dtype = reactant.dtype

    def energy(x):
        e = calc.energy(x, z)
        if bias_engine is not None and len(bias_engine):
            e = e + bias_engine.total_energy(x)
        return e

    h = calc.hessian(reactant, z)
    if bias_engine is not None and len(bias_engine):
        h = h + bias_engine.hessian(reactant)
    if n > 1:
        from multioptpy_tpu.geometry import tr_rot_projector
        from multioptpy_tpu.ops.eigh64 import eigh_deflated
        p = tr_rot_projector(reactant)
        h = project_hessian_tr_rot(h, reactant)
        w, v = eigh_deflated(0.5 * (h + h.T), p)
    else:
        w, v = _eigh_fast(0.5 * (h + h.T))
    # vibrational subspace only (see drivers/addf.py: TR/rot directions in
    # the sphere are zero-cost and 1/sqrt(floor)-amplified in cartesians)
    w_np, v_np = np.asarray(w), np.asarray(v)
    vib = w_np > config.eig_floor
    v_vib = jnp.asarray(v_np[:, vib])
    scale = jnp.sqrt(jnp.asarray(w_np[vib]))

    # align the product onto the reactant frame so the target direction is
    # purely vibrational (COM shift + Kabsch rotation); single-particle
    # model surfaces would be aligned ONTO the reactant, erasing the target
    if n >= 2:
        from multioptpy_tpu.geometry import align_to
        product = jnp.asarray(align_to(product, reactant))

    x0 = reactant.reshape(-1)

    def to_cart(q):
        return (x0 + v_vib @ (q / scale)).reshape(n, 3)

    def to_scaled(x):
        return scale * (v_vib.T @ (x.reshape(-1) - x0))

    energy_q = lambda q: energy(to_cart(q))

    prod_flat = product.reshape(-1)

    def objective_q(q):
        # true energy + product-directed pull (see TwoPSHSConfig)
        x = to_cart(q).reshape(-1)
        return (energy_q(q) + 0.5 * config.product_bias
                * jnp.sum((x - prod_flat) ** 2))

    grad_q = jax.grad(objective_q)

    @jax.jit
    def relax_on_sphere(q, r):
        def body(carry, _):
            q, vel, dt = carry
            g = grad_q(q)
            q_hat = q / (jnp.linalg.norm(q) + 1e-30)
            g_t = g - jnp.dot(g, q_hat) * q_hat
            power = jnp.sum(-g_t * vel)
            vel = jnp.where(power > 0, 0.9 * vel - dt * g_t, -dt * g_t)
            q = q + dt * vel
            q = q * (r / (jnp.linalg.norm(q) + 1e-30))
            return (q, vel, dt), None

        (q, _, _), _ = jax.lax.scan(
            body, (q, jnp.zeros_like(q),
                   jnp.asarray(config.relax_rate, dtype)),
            None, length=config.n_relax)
        return q, energy_q(q)

    q_prod = to_scaled(product)
    r_prod = float(jnp.linalg.norm(q_prod))
    seed_dir = q_prod / (jnp.linalg.norm(q_prod) + 1e-30)

    path = [np.asarray(reactant)]
    energies = [float(energy(reactant))]
    crossed = False
    r = config.r_start
    q = seed_dir * r
    while r < r_prod and len(path) <= config.n_spheres:
        q, e_q = relax_on_sphere(q, jnp.asarray(r, dtype))
        path.append(np.asarray(to_cart(q)))
        energies.append(float(e_q))
        if len(energies) > 2 and energies[-1] < energies[-2]:
            crossed = True
            break
        r += config.r_step
        q = q * (r / float(jnp.linalg.norm(q)))

    energies = np.asarray(energies)
    ts_idx = int(np.argmax(energies))
    return TwoPSHSResult(
        path=np.stack(path), energies=energies,
        ts_guess=np.asarray(path[ts_idx]), ts_energy=float(energies[ts_idx]),
        crossed_ts=crossed)
