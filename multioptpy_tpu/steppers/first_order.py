"""First-order step engines: FIRE family, conjugate gradient, L-BFGS, SD.

Pure-functional redesigns of the reference's stateful classes
(ref: multioptpy/Optimizer/{fire,conjugate_gradient,lbfgs,gradientdescent}.py).
Each engine is `step(state, gradient, ...) -> (move, new_state)` where state
is a NamedTuple pytree, so `vmap` batches ensembles and `lax.scan` runs whole
trajectories on device. Convention: geometry update is x_new = x + move
(downhill), NOT the reference's x - move (ref: optimizer.py:798).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# FIRE — fast inertial relaxation engine (PRL 97, 170201 (2006))
# ref: Optimizer/fire.py:6
# --------------------------------------------------------------------------

class FireState(NamedTuple):
    velocity: jnp.ndarray  # (D,)
    dt: jnp.ndarray        # scalar
    alpha: jnp.ndarray     # scalar
    n_good: jnp.ndarray    # int scalar: consecutive downhill steps


def fire_init(dim, dtype=jnp.float64, dt0=0.1, alpha0=0.1):
    return FireState(
        velocity=jnp.zeros((dim,), dtype),
        dt=jnp.asarray(dt0, dtype),
        alpha=jnp.asarray(alpha0, dtype),
        n_good=jnp.asarray(0, jnp.int32),
    )


def fire_step(state, gradient, dt_max=0.8, n_acc=5, f_inc=1.10, f_acc=0.99,
              f_dec=0.50, alpha_start=0.1):
    """One FIRE step (same control constants as ref: fire.py:10-16)."""
    force = -gradient
    v = state.velocity
    vnorm = jnp.linalg.norm(v)
    fnorm = jnp.linalg.norm(force)
    v_mix = (1.0 - state.alpha) * v + state.alpha * vnorm * force / (fnorm + _EPS)

    power = jnp.dot(v, force)
    downhill = power > 0.0
    accelerate = downhill & (state.n_good > n_acc)

    dt = jnp.where(downhill,
                   jnp.where(accelerate, jnp.minimum(state.dt * f_inc, dt_max), state.dt),
                   state.dt * f_dec)
    alpha = jnp.where(downhill,
                      jnp.where(accelerate, state.alpha * f_acc, state.alpha),
                      jnp.asarray(alpha_start, v.dtype))
    v_new = jnp.where(downhill, v_mix, jnp.zeros_like(v)) + dt * force
    n_good = jnp.where(downhill, state.n_good + 1, 0)

    move = dt * v_new
    return move, FireState(v_new, dt, alpha, n_good)


def fire2_step(state, gradient, dt_max=0.8, dt_min=0.002, n_acc=5,
               f_inc=1.10, f_acc=0.99, f_dec=0.50, alpha_start=0.1):
    """FIRE 2.0 (Guenole et al., Comput. Mater. Sci. 175 (2020) 109584):
    on uphill power the position is NOT advanced with the stale velocity and
    dt has a floor (ref: Optimizer/fire.py FIRE2 class)."""
    force = -gradient
    v = state.velocity
    power = jnp.dot(v, force)
    downhill = power > 0.0
    accelerate = downhill & (state.n_good > n_acc)

    dt = jnp.where(downhill,
                   jnp.where(accelerate, jnp.minimum(state.dt * f_inc, dt_max), state.dt),
                   jnp.maximum(state.dt * f_dec, dt_min))
    alpha = jnp.where(downhill,
                      jnp.where(accelerate, state.alpha * f_acc, state.alpha),
                      jnp.asarray(alpha_start, v.dtype))
    # uphill: correct position halfway back and zero velocity
    move_correction = jnp.where(downhill, 0.0, -0.5 * state.dt * v)

    vnorm = jnp.linalg.norm(v)
    fnorm = jnp.linalg.norm(force)
    v_mix = (1.0 - alpha) * v + alpha * vnorm * force / (fnorm + _EPS)
    v_new = jnp.where(downhill, v_mix, jnp.zeros_like(v)) + dt * force

    move = dt * v_new + move_correction
    n_good = jnp.where(downhill, state.n_good + 1, 0)
    return move, FireState(v_new, dt, alpha, n_good)


def abc_fire_step(state, gradient, dt_max=0.8, n_acc=5, f_inc=1.10,
                  f_acc=0.99, f_dec=0.50, alpha_start=0.1):
    """ABC-FIRE (Echeverri Restrepo & Andric, 2022): bias-corrected velocity
    mixing 1/(1-(1-alpha)^k) accelerates the inertial phase
    (ref: Optimizer/fire.py ABC_FIRE class)."""
    force = -gradient
    v = state.velocity
    power = jnp.dot(v, force)
    downhill = power > 0.0
    accelerate = downhill & (state.n_good > n_acc)

    dt = jnp.where(downhill,
                   jnp.where(accelerate, jnp.minimum(state.dt * f_inc, dt_max), state.dt),
                   state.dt * f_dec)
    alpha = jnp.where(downhill,
                      jnp.where(accelerate, state.alpha * f_acc, state.alpha),
                      jnp.asarray(alpha_start, v.dtype))

    k = jnp.maximum(state.n_good.astype(v.dtype) + 1.0, 1.0)
    bias = 1.0 / jnp.maximum(1.0 - (1.0 - alpha) ** k, _EPS)
    vnorm = jnp.linalg.norm(v)
    fnorm = jnp.linalg.norm(force)
    v_mix = bias * ((1.0 - alpha) * v + alpha * vnorm * force / (fnorm + _EPS))
    v_new = jnp.where(downhill, v_mix, jnp.zeros_like(v)) + dt * force

    move = dt * v_new
    n_good = jnp.where(downhill, state.n_good + 1, 0)
    return move, FireState(v_new, dt, alpha, n_good)


# --------------------------------------------------------------------------
# Conjugate gradient — FR / PR / HS / DY / HZ variants
# ref: Optimizer/conjugate_gradient.py:6
# --------------------------------------------------------------------------

class CgState(NamedTuple):
    direction: jnp.ndarray  # (D,) current search direction (descent)
    prev_gradient: jnp.ndarray
    initialized: jnp.ndarray  # bool scalar


def cg_init(dim, dtype=jnp.float64):
    return CgState(jnp.zeros((dim,), dtype), jnp.zeros((dim,), dtype),
                   jnp.asarray(False))


def _cg_beta(variant, g, g_prev, d):
    y = g - g_prev
    if variant == "pr":
        beta = jnp.dot(g, y) / (jnp.dot(g_prev, g_prev) + _EPS)
    elif variant == "fr":
        beta = jnp.dot(g, g) / (jnp.dot(g_prev, g_prev) + _EPS)
    elif variant == "hs":
        beta = jnp.dot(g, y) / (jnp.dot(d, y) + _EPS)
    elif variant == "dy":
        beta = jnp.dot(g, g) / (jnp.dot(d, y) + _EPS)
    elif variant == "hz":  # Hager-Zhang
        dy = jnp.dot(d, y) + _EPS
        beta = jnp.dot(y - 2.0 * d * jnp.dot(y, y) / dy, g) / dy
    else:
        raise ValueError(f"unknown CG variant {variant}")
    return jnp.maximum(beta, 0.0)  # PR+ style restart


def cg_step(state, gradient, variant="pr", delta=1.0):
    """One CG step; `variant` is static. Returns downhill move."""
    def first(_):
        d0 = -gradient
        return delta * d0, CgState(d0, gradient, jnp.asarray(True))

    def later(_):
        beta = _cg_beta(variant, gradient, state.prev_gradient, state.direction)
        d_new = -gradient + beta * state.direction
        # safeguard: restart on non-descent direction
        descent = jnp.dot(d_new, gradient) < 0.0
        d_new = jnp.where(descent, d_new, -gradient)
        alpha = jnp.abs(jnp.dot(gradient, d_new)) / (jnp.dot(d_new, d_new) + _EPS)
        return delta * alpha * d_new, CgState(d_new, gradient, jnp.asarray(True))

    return jax.lax.cond(state.initialized, later, first, operand=None)


# --------------------------------------------------------------------------
# L-BFGS — two-loop recursion with static-shape circular history
# ref: Optimizer/lbfgs.py:4
# --------------------------------------------------------------------------

class LbfgsState(NamedTuple):
    s_hist: jnp.ndarray   # (M, D)
    y_hist: jnp.ndarray   # (M, D)
    rho: jnp.ndarray      # (M,)
    count: jnp.ndarray    # total pairs stored (int)
    prev_geometry: jnp.ndarray  # (D,)
    prev_gradient: jnp.ndarray  # (D,)
    initialized: jnp.ndarray


def lbfgs_init(dim, history=12, dtype=jnp.float64):
    return LbfgsState(
        s_hist=jnp.zeros((history, dim), dtype),
        y_hist=jnp.zeros((history, dim), dtype),
        rho=jnp.zeros((history,), dtype),
        count=jnp.asarray(0, jnp.int32),
        prev_geometry=jnp.zeros((dim,), dtype),
        prev_gradient=jnp.zeros((dim,), dtype),
        initialized=jnp.asarray(False),
    )


def lbfgs_step(state, geometry_flat, gradient, delta=1.0):
    """Two-loop recursion over a masked circular buffer (static shapes so the
    whole engine vmaps over an ensemble axis — the reference keeps python
    lists, ref: lbfgs.py)."""
    m = state.s_hist.shape[0]

    # push (s, y) pair if we have history
    s = geometry_flat - state.prev_geometry
    y = gradient - state.prev_gradient
    sy = jnp.dot(s, y)
    admit = state.initialized & (jnp.abs(sy) > 1e-12)
    slot = state.count % m
    s_hist = jnp.where(admit, state.s_hist.at[slot].set(s), state.s_hist)
    y_hist = jnp.where(admit, state.y_hist.at[slot].set(y), state.y_hist)
    rho = jnp.where(admit, state.rho.at[slot].set(
        1.0 / jnp.where(jnp.abs(sy) > 1e-12, sy, 1.0)), state.rho)
    count = jnp.where(admit, state.count + 1, state.count)

    n_avail = jnp.minimum(count, m)
    # iterate newest -> oldest: order index k = 0..m-1 maps to slot
    # (count - 1 - k) mod m, masked by k < n_avail
    ks = jnp.arange(m)
    slots = (count - 1 - ks) % m
    mask = ks < n_avail

    def backward(carry, idx):
        q, alphas = carry
        i, valid = idx
        a = rho[i] * jnp.dot(s_hist[i], q)
        a = jnp.where(valid, a, 0.0)
        q = q - a * y_hist[i]
        return (q, alphas), a

    (q, _), alpha_seq = jax.lax.scan(
        backward, (gradient, None), (slots, mask))

    # initial scaling gamma = s.y / y.y of most recent pair
    last = (count - 1) % m
    yy = jnp.dot(y_hist[last], y_hist[last])
    gamma = jnp.where((n_avail > 0) & (yy > 1e-12),
                      (1.0 / jnp.maximum(rho[last], 1e-30)) / jnp.maximum(yy, 1e-30),
                      1.0)
    gamma = jnp.clip(gamma, 1e-3, 1e3)
    r = gamma * q

    def forward(r, idx):
        i, valid, a = idx
        b = rho[i] * jnp.dot(y_hist[i], r)
        r = r + jnp.where(valid, (a - b), 0.0) * s_hist[i]
        return r, None

    r, _ = jax.lax.scan(forward, r, (slots[::-1], mask[::-1], alpha_seq[::-1]))

    move = -delta * r
    # first step: plain steepest descent
    move = jnp.where(state.initialized, move, -delta * gradient)

    new_state = LbfgsState(s_hist, y_hist, rho, count,
                           geometry_flat, gradient, jnp.asarray(True))
    return move, new_state


# --------------------------------------------------------------------------
# Steepest descent (+ mass-weighted) — ref: Optimizer/gradientdescent.py:39
# --------------------------------------------------------------------------

def sd_step(gradient, delta=1.0):
    return -delta * gradient


def mwsd_step(gradient, masses3, delta=1.0):
    """Mass-weighted SD: scale per-coordinate by <m>/m_i
    (ref: gradientdescent.py MassWeightedGradientDescent)."""
    w = jnp.mean(masses3) / masses3
    return -delta * w * gradient
