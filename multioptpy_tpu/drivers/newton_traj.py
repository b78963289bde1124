"""Growing Newton trajectory (GNT) — single-ended TS search.

ref: multioptpy/OtherMethod/newton_traj.py:9 (main :344): follow the Newton
trajectory — the curve along which the gradient stays parallel to a fixed
search direction r (Quapp's reduced-gradient-following / growing Newton
trajectory). The trajectory passes through every stationary point whose
gradient direction matches r; the first saddle en route to the product is
located where |g| peaks then collapses.

Implementation: predictor step along r, then a fixed number of corrector
steps minimizing the gradient component PERPENDICULAR to r (projected
steepest descent), per frontier point. Direction r defaults to the
reactant->product difference vector (the reference's two-file mode) or an
explicit `gnt_vec`.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GNTConfig:
    step_size: float = 0.1        # Bohr predictor step
    n_steps: int = 100
    n_corrector: int = 20
    corrector_rate: float = 0.5
    grad_threshold: float = 5e-4  # stationary-point detection on |g|


class GNTResult(NamedTuple):
    path: np.ndarray            # (S,N,3)
    energies: np.ndarray
    grad_norms: np.ndarray
    ts_guess: jnp.ndarray       # highest-energy point on the trajectory
    ts_energy: float
    stationary_points: list     # indices where |g| dips below threshold


def newton_trajectory(calc, coords, z, direction=None, product_coords=None,
                      config=GNTConfig(), bias_engine=None):
    """Grow a Newton trajectory from `coords` along `direction` (or toward
    `product_coords`)."""
    from multioptpy_tpu.geometry import align_to, project_gradient_tr_rot

    coords = jnp.asarray(coords)
    z = jnp.asarray(z)
    n_atoms = coords.shape[0]
    # single-particle model surfaces (Muller-Brown etc.) have no TR/rot
    # modes worth removing — and projecting translations would annihilate
    # the search direction entirely
    internal = n_atoms >= 2
    if product_coords is not None and internal:
        # COM + Kabsch align so the search direction is purely internal
        product_coords = jnp.asarray(align_to(jnp.asarray(product_coords),
                                              coords))
    if direction is None:
        if product_coords is None:
            raise ValueError("give a direction vector or product_coords")
        direction = jnp.asarray(product_coords) - coords
    # TR/rot-free direction: otherwise the corrector's perpendicular space
    # contains rigid motions and the trajectory advances along r by
    # drifting the whole molecule at constant energy (measured on HCN:
    # 63 predictor steps, energy pinned at the reactant minimum)
    r = jnp.asarray(direction, coords.dtype).reshape(coords.shape)
    if internal:
        r = project_gradient_tr_rot(r, coords)
    r = r.reshape(-1)
    r = r / (jnp.linalg.norm(r) + 1e-30)

    def energy_grad(x):
        e, g = calc.energy_and_gradient(x, z)
        if bias_engine is not None and len(bias_engine):
            be, bg = bias_engine.energy_and_gradient(x)
            e, g = e + be, g + bg
        return e, g

    @jax.jit
    def advance(x):
        # predictor along r
        x = x + (config.step_size * r).reshape(x.shape)

        # correctors: remove the gradient component perpendicular to r,
        # restricted to internal motions (TR/rot projected out so the
        # relaxation cannot rigid-shift the molecule along r)
        def corr(_, x):
            _, g = energy_grad(x)
            g_int = project_gradient_tr_rot(g, x) if internal else g
            g_flat = g_int.reshape(-1)
            g_perp = g_flat - jnp.dot(g_flat, r) * r
            return x - (config.corrector_rate * g_perp).reshape(x.shape)

        x = jax.lax.fori_loop(0, config.n_corrector, corr, x)
        e, g = energy_grad(x)
        return x, e, jnp.linalg.norm(g)

    # cap the trajectory at the product (plus a small margin) when given
    n_steps = config.n_steps
    if product_coords is not None:
        dist = float(jnp.linalg.norm(
            (jnp.asarray(product_coords) - coords).reshape(-1)))
        n_steps = min(n_steps, int(np.ceil(dist / config.step_size)) + 2)

    path, energies, gnorms = [np.asarray(coords)], [], []
    e0, g0 = energy_grad(coords)
    energies.append(float(e0))
    gnorms.append(float(jnp.linalg.norm(g0)))
    x = coords
    stationary = []
    for i in range(1, n_steps + 1):
        x, e, gn = advance(x)
        path.append(np.asarray(x))
        energies.append(float(e))
        gnorms.append(float(gn))
        if float(gn) < config.grad_threshold:
            stationary.append(i)
        # reference-style stationary passing on the energy profile
        # (newton_traj.py:265-276): a local max triple marks a crossed
        # TS — in single-ended mode stop there (check_convergence
        # :317-323 stops the main loop at the first TS); in two-point
        # mode keep growing toward the product. A local min is
        # recorded only.
        if len(energies) >= 3 and energies[-3] < energies[-2] > energies[-1]:
            if i - 1 not in stationary:
                stationary.append(i - 1)
            if product_coords is None:
                break
        if len(energies) >= 3 and energies[-3] > energies[-2] < energies[-1]:
            if i - 1 not in stationary:
                stationary.append(i - 1)
        if product_coords is not None and float(jnp.dot(
                (x - jnp.asarray(product_coords)).reshape(-1), r)) > 0:
            break  # walked past the product projection

    energies = np.asarray(energies)
    ts_idx = int(np.argmax(energies))
    return GNTResult(
        path=np.stack(path), energies=energies,
        grad_norms=np.asarray(gnorms),
        ts_guess=jnp.asarray(path[ts_idx]), ts_energy=float(energies[ts_idx]),
        stationary_points=stationary,
    )
