"""Step enhancements: line search, TRIM, scaling, coordinate locking,
mode following.

ref: multioptpy/Optimizer/{linesearch, trim, component_wise_scaling,
coordinate_locking, mode_following, purtubation}.py — the reference chains
these onto base engines (optimizer.py:328-387). Each is a pure function
transforming a proposed move (and optionally consuming extra backend calls).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
# f64-on-TPU routes to the seeded solver; identity elsewhere
from multioptpy_tpu.ops.eigh64 import eigh_fast as _eigh_fast


def backtracking_linesearch(energy_fn, coords, move, e0, g0_flat,
                            n_trials=4, shrink=0.5, c1=1e-4):
    """Armijo backtracking with a FIXED trial count (branchless: all trial
    energies are evaluated, the largest step satisfying the Armijo condition
    wins, falling back to the smallest trial). ref: Optimizer/linesearch.py.

    energy_fn: coords -> scalar (traceable).
    Returns the scaled move.
    """
    alphas = shrink ** jnp.arange(n_trials, dtype=move.dtype)  # 1, s, s^2...
    slope = jnp.dot(g0_flat, move.reshape(-1))

    def trial(alpha):
        e = energy_fn(coords + alpha * move)
        ok = e <= e0 + c1 * alpha * slope
        return e, ok

    es, oks = jax.vmap(trial)(alphas)
    # first (largest) alpha that passes; else the smallest trial
    idx = jnp.argmax(oks)  # first True (argmax of bools)
    any_ok = jnp.any(oks)
    alpha = jnp.where(any_ok, alphas[idx], alphas[-1])
    return alpha * move


def trim_step(gradient, hessian, trust_radius, saddle_order=0):
    """Trust-region image minimization (TRIM, Helgaker CPL 182 (1991) 503;
    ref: Optimizer/trim.py): Newton step with a level shift chosen by
    bisection so |step| <= trust radius; the lowest `saddle_order` modes are
    shifted in the opposite direction (image function)."""
    d, v = _eigh_fast(0.5 * (hessian + hessian.T))
    g_t = v.T @ gradient
    n = d.shape[0]
    flip = jnp.arange(n) < saddle_order
    sign = jnp.where(flip, -1.0, 1.0)
    d_im = d * sign
    g_im = g_t * sign

    def step_of(mu):
        den = d_im + mu
        safe = jnp.where(jnp.abs(den) > 1e-12, den,
                         jnp.where(den >= 0, 1e-12, -1e-12))
        return -g_im / safe

    # mu=max(0, -lambda_min)+eps gives a descent-like step; grow mu until
    # within trust radius
    mu0 = jnp.maximum(0.0, -jnp.min(d_im)) + 1e-8

    def grow(_, mu):
        too_big = jnp.linalg.norm(step_of(mu)) > trust_radius
        return jnp.where(too_big, mu * 2.0 + 1e-8, mu)

    mu_hi = jax.lax.fori_loop(0, 40, grow, mu0)

    def bisect(_, ab):
        lo, hi = ab
        mid = 0.5 * (lo + hi)
        too_big = jnp.linalg.norm(step_of(mid)) > trust_radius
        return (jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid))

    lo, hi = jax.lax.fori_loop(0, 60, bisect, (mu0, mu_hi))
    use_newton = jnp.linalg.norm(step_of(mu0)) <= trust_radius
    mu = jnp.where(use_newton, mu0, 0.5 * (lo + hi))
    # the image-function zetas are used as-is in the eigenvector basis —
    # no sign un-flip, matching the reference (trim.py:195 step =
    # eigvecs @ zetas with flipped eigvals_ AND gradient_)
    return v @ step_of(mu)


def componentwise_scaling(move, max_component):
    """Clamp every Cartesian component of the move
    (ref: Optimizer/component_wise_scaling.py)."""
    return jnp.clip(move, -max_component, max_component)


def coordinate_locking(move, lock_mask):
    """Zero the move on locked degrees of freedom; lock_mask: 1 = locked
    (ref: Optimizer/coordinate_locking.py)."""
    return move * (1.0 - lock_mask)


def mode_following_direction(hessian, reference_mode=None, index=0):
    """Pick the eigenvector to follow: by overlap with a reference mode if
    given, else by index (ref: Optimizer/mode_following.py:6 — feeds
    MF_RSIRFO's image projector)."""
    d, v = _eigh_fast(0.5 * (hessian + hessian.T))
    if reference_mode is None:
        return v[:, index], d[index]
    overlaps = jnp.abs(v.T @ reference_mode)
    i = jnp.argmax(overlaps)
    return v[:, i], d[i]


def perturb_move(move, key, magnitude=1e-3):
    """Random perturbation enhancement to escape symmetric traps
    (ref: Optimizer/purtubation.py:3)."""
    noise = jax.random.normal(key, move.shape, dtype=move.dtype)
    return move + magnitude * noise * jnp.linalg.norm(move) / (
        jnp.linalg.norm(noise) + 1e-30)


def geodesic_correct_move(move, coords, internals, n_rk4=16):
    """Re-trace a Cartesian step as a geodesic of the bond-metric
    G = B B^T (Hermes & Zimmerman-style speedup, JCP 155 (2021) 094105;
    ref: Optimizer/geodesic_step.py:7 GeodesicStepper).

    Mirrors the reference's construction exactly — Christoffel symbols
    Gamma[i,j,k] = Ginv[i,k] * sum_ab dB[i,a,b] B[j,b], frozen at the
    starting geometry, symmetrized over (j,k) — but the three nested
    O(M^2 * 3N) Python loops (geodesic_step.py:218-237) become two einsums,
    the LSODA call becomes a fixed-step RK4 `lax.scan` (jit/vmap-safe), and
    dB comes from `jax.jacfwd` instead of hand-coded bond second derivatives.

    move: flat (3N,) proposed Cartesian step; returns the corrected move.
    """
    x0 = coords.reshape(-1)
    b = internals.b_matrix(coords)                       # (M, 3N)
    d2q = jax.jacfwd(jax.jacfwd(internals.q_flat))(x0)   # (M, 3N, 3N)
    g = b @ b.T
    ginv = internals.g_pinv(g)
    s_ij = jnp.einsum("iab,jb->ij", d2q, b)
    gamma = jnp.einsum("ik,ij->ijk", ginv, s_ij)
    gamma = 0.5 * (gamma + jnp.swapaxes(gamma, 1, 2))

    q0 = internals.q_flat(x0)
    qd0 = b @ move

    dt = 1.0 / n_rk4

    def accel(qd):
        return -jnp.einsum("ijk,j,k->i", gamma, qd, qd)

    def rk4(carry, _):
        q, qd = carry
        k1q, k1v = qd, accel(qd)
        k2q, k2v = qd + 0.5 * dt * k1v, accel(qd + 0.5 * dt * k1v)
        k3q, k3v = qd + 0.5 * dt * k2v, accel(qd + 0.5 * dt * k2v)
        k4q, k4v = qd + dt * k3v, accel(qd + dt * k3v)
        q = q + dt / 6.0 * (k1q + 2 * k2q + 2 * k3q + k4q)
        qd = qd + dt / 6.0 * (k1v + 2 * k2v + 2 * k3v + k4v)
        return (q, qd), None

    (q1, _), _ = jax.lax.scan(rk4, (q0, qd0), None, length=n_rk4)
    x1 = internals.to_cartesian(q1, coords)
    # the retrace only realizes the IN-internal-space part of the move; the
    # component in the null space of B (e.g. bends when only bonds are
    # primitives) must pass through unchanged or the optimizer loses those
    # degrees of freedom entirely
    p_range = b.T @ (ginv @ b)                 # projector onto range(B^T)
    null_part = move - p_range @ move
    corrected = (x1.reshape(-1) - x0) + null_part
    # safeguard: fall back to the straight step if the back-transform
    # wandered (same spirit as the reference's fallback on solver failure)
    ok = (jnp.all(jnp.isfinite(corrected))
          & (jnp.linalg.norm(corrected)
             < 3.0 * jnp.linalg.norm(move) + 1e-12))
    return jnp.where(ok, corrected, move)
