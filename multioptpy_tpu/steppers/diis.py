"""DIIS geometry extrapolation (GDIIS family).

ref: multioptpy/Optimizer/{gdiis,ediis,gediis,c2diis,adiis,kdiis}.py — the
reference chains these as "enhancements" onto step engines
(ref: optimizer.py:328-387). Here GDIIS is a pure-functional state machine
with a static-shape circular history, applied by the driver on top of the
quasi-Newton step.

GDIIS (Csaszar & Pulay, J. Mol. Struct. 114 (1984) 31): with histories
{x_k} and error vectors {e_k} (quasi-Newton steps -H^-1 g_k), find
coefficients c minimizing |sum c_k e_k|^2 subject to sum c = 1, then
    x* = sum c_k x_k + sum c_k e_k.
Falls back to the plain step when the DIIS system is ill-conditioned or the
extrapolated step is too large (standard safeguards).
"""

from typing import NamedTuple

import jax.numpy as jnp


class DiisState(NamedTuple):
    x_hist: jnp.ndarray   # (M, D)
    e_hist: jnp.ndarray   # (M, D)
    count: jnp.ndarray


def diis_init(dim, history=5, dtype=jnp.float64):
    return DiisState(jnp.zeros((history, dim), dtype),
                     jnp.zeros((history, dim), dtype),
                     jnp.asarray(0, jnp.int32))


def gdiis_step(state, x, error, plain_step, max_step_ratio=3.0):
    """Push (x, e) and return (move, new_state).

    error: the quasi-Newton step vector for the CURRENT point (e = -H^-1 g).
    plain_step: fallback move (usually == error after trust clamping).
    """
    m = state.x_hist.shape[0]
    slot = state.count % m
    x_hist = state.x_hist.at[slot].set(x)
    e_hist = state.e_hist.at[slot].set(error)
    count = state.count + 1
    n_avail = jnp.minimum(count, m)
    valid = (jnp.arange(m) < n_avail)

    # bordered DIIS system: [B 1; 1 0][c; lam] = [0; 1]
    b = e_hist @ e_hist.T
    scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
    vmask = valid.astype(b.dtype)
    b = b * vmask[:, None] * vmask[None, :] + jnp.diag(1.0 - vmask) * scale
    big = jnp.zeros((m + 1, m + 1), dtype=b.dtype)
    big = big.at[:m, :m].set(b + 1e-10 * scale * jnp.eye(m, dtype=b.dtype))
    big = big.at[:m, m].set(vmask)
    big = big.at[m, :m].set(vmask)
    rhs = jnp.zeros((m + 1,), b.dtype).at[m].set(1.0)
    sol = jnp.linalg.solve(big, rhs)
    c = sol[:m] * vmask

    x_star = c @ x_hist + c @ e_hist
    move_diis = x_star - x

    # safeguards: enough history, finite, not wildly larger than the plain
    # step (ref: gdiis.py rejection logic)
    plain_norm = jnp.linalg.norm(plain_step)
    ok = ((n_avail >= 2)
          & jnp.all(jnp.isfinite(move_diis))
          & (jnp.linalg.norm(move_diis) <= max_step_ratio * plain_norm + 1e-30))
    move = jnp.where(ok, move_diis, plain_step)
    return move, DiisState(x_hist, e_hist, count)
