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

import jax
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


def _simplex_qp(b_mat, lin, n_iter=200, lr=0.1):
    """Minimize c^T lin + 0.5 c^T B c over the probability simplex by
    fixed-iteration projected (softmax-parametrized) gradient descent —
    branchless, jittable."""
    m = lin.shape[0]
    theta0 = jnp.zeros((m,), b_mat.dtype)

    def body(_, theta):
        c = jax.nn.softmax(theta)
        grad_c = lin + b_mat @ c
        # chain rule through softmax
        grad_theta = c * (grad_c - jnp.dot(c, grad_c))
        return theta - lr * grad_theta

    theta = jax.lax.fori_loop(0, n_iter, body, theta0)
    return jax.nn.softmax(theta)


def ediis_coefficients(energies, x_hist, g_hist, valid_mask):
    """EDIIS (Kudin-Scuseria-Cances): minimize sum c_i E_i
    - 0.5 sum_ij c_i c_j (g_i - g_j).(x_i - x_j) with c on the simplex
    (ref: Optimizer/ediis.py). Returns (M,) coefficients."""
    dtype = x_hist.dtype
    m = x_hist.shape[0]
    gx = jnp.einsum("id,jd->ij", g_hist, x_hist)
    diag = jnp.diagonal(gx)
    # (g_i - g_j).(x_i - x_j) = gx_ii + gx_jj - gx_ij - gx_ji
    b = -(diag[:, None] + diag[None, :] - gx - gx.T)
    big = jnp.max(jnp.abs(energies)) + 1.0
    lin = jnp.where(valid_mask, energies, big)  # invalid entries deterred
    vm = valid_mask.astype(dtype)
    b = b * vm[:, None] * vm[None, :]
    return _simplex_qp(b, lin)


def adiis_coefficients(energies, x_hist, g_hist, valid_mask):
    """ADIIS (Hu & Yang, JCP 132 (2010) 054109): linear term uses
    gradient-displacement overlaps against the LATEST point
    (ref: Optimizer/adiis.py)."""
    dtype = x_hist.dtype
    x_n = x_hist[-1]
    g_n = g_hist[-1]
    lin = 2.0 * jnp.einsum("id,d->i", x_hist - x_n[None, :], g_n)
    b = 2.0 * jnp.einsum("id,jd->ij", x_hist - x_n[None, :],
                         g_hist - g_n[None, :])
    b = 0.5 * (b + b.T)
    vm = valid_mask.astype(dtype)
    big = jnp.max(jnp.abs(lin)) + 1.0
    lin = jnp.where(valid_mask, lin, big)
    b = b * vm[:, None] * vm[None, :]
    return _simplex_qp(b, lin)


def c2diis_coefficients(e_hist, valid_mask):
    """C2-DIIS (Sellers 1993): eigenvector of the error-overlap matrix with
    the smallest predicted residual, normalized to sum 1 — avoids the
    ill-conditioned bordered solve (ref: Optimizer/c2diis.py)."""
    dtype = e_hist.dtype
    b = e_hist @ e_hist.T
    vm = valid_mask.astype(dtype)
    scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
    b = b * vm[:, None] * vm[None, :] + jnp.diag(1.0 - vm) * scale * 1e6
    w, v = jnp.linalg.eigh(b)
    # candidate coefficient vectors: each eigenvector normalized to sum 1
    sums = jnp.sum(v, axis=0)
    safe = jnp.where(jnp.abs(sums) > 1e-8, sums, 1.0)
    cands = v / safe[None, :]
    # predicted residual |sum c e|^2 = c^T B c for each candidate
    res = jnp.einsum("im,ij,jm->m", cands, b, cands)
    res = jnp.where(jnp.abs(sums) > 1e-8, res, jnp.inf)
    best = jnp.argmin(res)
    return cands[:, best]
