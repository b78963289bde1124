"""Double-ended and single-ended TS-search engines: iEIP, dimer, spring pair.

ref: multioptpy/ieip.py:191 (driver reading *_A.xyz / *_B.xyz pairs),
OtherMethod/elastic_image_pair.py:10 (iEIP, JCTC 2023, 10.1021/acs.jctc.3c00293),
OtherMethod/dimer.py:12 (dimer method, Henkelman & Jonsson JCP 111, 7010),
OtherMethod/spring_pair_method.py:8.

All engines are jitted fixed-iteration loops over a pair-of-images (or
image+orientation) pytree — the pair advances as a batch of 2 where the
reference loops sequentially.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class IEIPConfig:
    engine: str = "eip"            # eip | dimer | spring_pair
    n_steps: int = 300
    step_size: float = 0.05        # Bohr per iteration
    pull_strength: float = 0.05    # image-pair attraction (eip/spring_pair)
    min_pair_distance: float = 0.3  # Bohr: stop when images meet
    dimer_separation: float = 0.01  # dimer half-length
    dimer_rot_step: float = 0.5     # rotation mixing per iteration (the
                                    # reference's -dimer_trial_angle scales
                                    # its rotational line search; here it
                                    # scales the fixed rotation step)
    dimer_trans_rate: float = 0.5   # translation learning rate: the step
                                    # is rate*F clipped to step_size; an
                                    # undamped rate-1 explicit-Euler walk
                                    # limit-cycles on modes with curvature
                                    # > 2 instead of converging
    fmax: float = 1e-4


class IEIPResult(NamedTuple):
    ts_guess: jnp.ndarray
    ts_energy: float
    image_a: jnp.ndarray
    image_b: jnp.ndarray
    n_iterations: int
    converged: bool


def _perp(v, d_hat):
    return v - jnp.sum(v * d_hat) * d_hat


def ieip(calc, coords_a, coords_b, z, config=IEIPConfig(), bias_engine=None):
    """Run the selected double-ended engine from an (A, B) geometry pair."""
    z = jnp.asarray(z)
    a = jnp.asarray(coords_a)
    b = jnp.asarray(coords_b)

    def energy_grad(x):
        e, g = calc.energy_and_gradient(x, z)
        if bias_engine is not None and len(bias_engine):
            be, bg = bias_engine.energy_and_gradient(x)
            e, g = e + be, g + bg
        return e, g

    if config.engine in ("eip", "spring_pair"):
        return _elastic_image_pair(energy_grad, a, b, config)
    if config.engine == "dimer":
        mid = 0.5 * (a + b)
        direction = (b - a) / (jnp.linalg.norm(b - a) + 1e-30)
        return _dimer(energy_grad, mid, direction, config)
    raise ValueError(f"unknown iEIP engine '{config.engine}'")


def _elastic_image_pair(energy_grad, a, b, config):
    """iEIP core (ref: elastic_image_pair.py:347 iteration): both images
    relax perpendicular to the pair axis while a pulling force closes the
    gap; near-meeting midpoint approximates the TS."""
    ds = config.step_size
    pull = config.pull_strength

    @jax.jit
    def step(pair):
        a, b = pair
        e_a, g_a = energy_grad(a)
        e_b, g_b = energy_grad(b)
        d = b - a
        dist = jnp.linalg.norm(d) + 1e-30
        d_hat = d / dist

        # perpendicular relaxation + along-axis pull (higher image is pulled
        # less so the pair climbs toward the saddle between them)
        f_a = -_perp(g_a, d_hat) + pull * dist * d_hat
        f_b = -_perp(g_b, d_hat) - pull * dist * d_hat

        def clip(f):
            n = jnp.linalg.norm(f)
            return jnp.where(n > ds, f * ds / n, f)

        return (a + clip(f_a), b + clip(f_b)), (e_a, e_b, dist)

    pair = (a, b)
    it = 0
    e_a = e_b = 0.0
    for it in range(1, config.n_steps + 1):
        pair, (e_a, e_b, dist) = step(pair)
        if float(dist) < config.min_pair_distance:
            break
    a, b = pair
    mid = 0.5 * (a + b)
    e_mid, g_mid = energy_grad(mid)
    return IEIPResult(ts_guess=mid, ts_energy=float(e_mid), image_a=a,
                      image_b=b, n_iterations=it,
                      converged=float(jnp.linalg.norm(g_mid)) < 10 * config.fmax
                      or float(dist) < config.min_pair_distance)


def _dimer(energy_grad, x0, v0, config):
    """Dimer method (ref: OtherMethod/dimer.py:12): rotate the dimer into
    the lowest-curvature mode using gradient differences, then translate
    on the mode-reversed force. Gradient-only (no Hessian). The rotation
    iterates to convergence-ish per translation step (the reference runs a
    rotational line search per step, dimer.py Henkelman & Jonsson JCP 111,
    7010), and the translation is a FIRE walk on the effective force:
    -g + 2(g.v)v in the concave region, +(g.v)v in the convex region
    (climb OUT along the mode — the raw parallel force points back to the
    minimum there)."""
    dr = config.dimer_separation
    ds = config.step_size
    n_rot = 4

    @jax.jit
    def step(x, v, vel, dt):
        e0, g0 = energy_grad(x)
        g_flat = g0.reshape(-1)

        def rot_body(carry, _):
            v_flat, _curv = carry
            _, g1 = energy_grad(x + dr * v_flat.reshape(x.shape))
            df = (g1 - g0).reshape(-1)
            curv = jnp.dot(df, v_flat) / dr
            f_rot = -(df - jnp.dot(df, v_flat) * v_flat)
            v_new = v_flat + config.dimer_rot_step * f_rot / (
                jnp.linalg.norm(df) + 1e-10)
            v_new = v_new / (jnp.linalg.norm(v_new) + 1e-30)
            return (v_new, curv), None

        (v_flat, curv), _ = jax.lax.scan(
            rot_body, (v.reshape(-1), jnp.asarray(0.0, x.dtype)),
            None, length=n_rot)

        f_eff = jnp.where(
            curv < 0.0,
            -(g_flat - 2.0 * jnp.dot(g_flat, v_flat) * v_flat),
            jnp.dot(g_flat, v_flat) * v_flat)

        # FIRE mixing on the translation
        power = jnp.dot(f_eff, vel)
        vel = jnp.where(power > 0.0, 0.9 * vel + dt * f_eff, dt * f_eff)
        dt = jnp.where(power > 0.0, jnp.minimum(dt * 1.1, 2.0),
                       jnp.maximum(dt * 0.5, 0.02))
        move = vel * config.dimer_trans_rate
        mn = jnp.linalg.norm(move)
        move = jnp.where(mn > ds, move * ds / mn, move)
        return (x + move.reshape(x.shape), v_flat.reshape(v.shape), vel,
                dt, e0, jnp.max(jnp.abs(g0)))

    x, v = x0, v0
    vel = jnp.zeros(x.size, x.dtype)
    dt = jnp.asarray(0.5, x.dtype)
    it = 0
    converged = False
    for it in range(1, config.n_steps + 1):
        x, v, vel, dt, e0, gmax = step(x, v, vel, dt)
        if float(gmax) < config.fmax:
            converged = True
            break
    e_fin, _ = energy_grad(x)
    return IEIPResult(ts_guess=x, ts_energy=float(e_fin), image_a=x - dr * v,
                      image_b=x + dr * v, n_iterations=it,
                      converged=converged)
