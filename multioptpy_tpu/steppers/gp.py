"""Gaussian-process surrogate steppers (GPmin / GPR step).

ref: multioptpy/Optimizer/{gpmin.py (632 LoC), gpr_step.py (422 LoC)} and the
GP machinery of MEP/pathopt_gpneb_force.py:23-153: fit an RBF-kernel GP to
the optimization history (energies + gradients) and step to the surrogate
minimum instead of a quasi-Newton extrapolation (Koistinen et al., JCP 147
(2017) 152720).

Gradient-enhanced GP: observations y = [E_1..E_m, g_1..g_m] with the joint
kernel [[K, K1], [K1^T, K2]] of value/derivative covariances — all closed
form for the RBF kernel, all autodiff-checked. Static history shapes.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GpState(NamedTuple):
    x_hist: jnp.ndarray   # (M, D)
    e_hist: jnp.ndarray   # (M,)
    g_hist: jnp.ndarray   # (M, D)
    count: jnp.ndarray


def gp_init(dim, history=8, dtype=jnp.float64):
    return GpState(jnp.zeros((history, dim), dtype),
                   jnp.zeros((history,), dtype),
                   jnp.zeros((history, dim), dtype),
                   jnp.asarray(0, jnp.int32))


def _rbf(x1, x2, ls):
    d2 = jnp.sum((x1 - x2) ** 2)
    return jnp.exp(-0.5 * d2 / ls ** 2)


def gp_posterior_energy(x_query, state, lengthscale=1.0, noise=1e-8):
    """Gradient-enhanced GP posterior mean at x_query (scalar).

    Uses values + gradients of all valid history points; invalid slots are
    masked via a large nugget on their diagonal.
    """
    m, d = state.x_hist.shape
    ls = lengthscale
    valid = (jnp.arange(m) < jnp.minimum(state.count, m))

    k_fn = lambda a, b: _rbf(a, b, ls)
    # blocks: K_vv (m,m), K_vg (m, m*d), K_gg (m*d, m*d) via autodiff
    k_vv = jax.vmap(lambda a: jax.vmap(lambda b: k_fn(a, b))(state.x_hist))(
        state.x_hist)
    # dk/db: (m, m, d)
    k_vg = jax.vmap(lambda a: jax.vmap(
        lambda b: jax.grad(lambda bb: k_fn(a, bb))(b))(state.x_hist))(
        state.x_hist)
    # d2k/da db: (m, m, d, d)
    k_gg = jax.vmap(lambda a: jax.vmap(
        lambda b: jax.jacfwd(lambda aa: jax.grad(
            lambda bb: k_fn(aa, bb))(b))(a))(state.x_hist))(state.x_hist)

    n_total = m + m * d
    big = jnp.zeros((n_total, n_total), state.x_hist.dtype)
    big = big.at[:m, :m].set(k_vv)
    big = big.at[:m, m:].set(k_vg.reshape(m, m * d))
    big = big.at[m:, :m].set(k_vg.reshape(m, m * d).T)
    big = big.at[m:, m:].set(
        jnp.transpose(k_gg, (0, 2, 1, 3)).reshape(m * d, m * d))

    vmask = jnp.concatenate([valid, jnp.repeat(valid, d)])
    nugget = jnp.where(vmask, noise, 1e6)
    big = big + jnp.diag(nugget)

    e_mean = jnp.sum(jnp.where(valid, state.e_hist, 0.0)) / \
        jnp.maximum(jnp.sum(valid), 1)
    y = jnp.concatenate([jnp.where(valid, state.e_hist - e_mean, 0.0),
                         (state.g_hist * valid[:, None]).reshape(-1)])
    from multioptpy_tpu.ops.eigh64 import solve_f64safe
    alpha = solve_f64safe(big, y, assume_sym=True)

    k_q_v = jax.vmap(lambda b: k_fn(x_query, b))(state.x_hist)
    k_q_g = jax.vmap(lambda b: jax.grad(
        lambda bb: k_fn(x_query, bb))(b))(state.x_hist).reshape(-1)
    k_q = jnp.concatenate([k_q_v, k_q_g])
    return e_mean + jnp.dot(k_q, alpha)


def inv_dist_descriptor(n_atoms, dist_scale=1.0, min_dist=0.5):
    """Inverse-distance descriptor phi(x) = 1/(max(r_ij, min_dist) scale)
    over the upper-triangle pairs — the reference GPmin's
    rotation/translation-invariant feature space
    (ref: gpmin.py:223 _cart_to_inverse_dist). Returns (phi_fn, P)."""
    import numpy as np

    iu, ju = np.triu_indices(n_atoms, k=1)

    def phi(x_flat):
        c = x_flat.reshape(n_atoms, 3)
        d = jnp.linalg.norm(c[iu] - c[ju], axis=1)
        return 1.0 / (jnp.maximum(d, min_dist) * dist_scale)

    return phi, len(iu)


def gp_step(state, x, energy, gradient, lengthscale=1.0, n_descent=30,
            rate=0.2, max_step=0.5, phi_fn=None):
    """Push the observation, then descend the SURROGATE from x and return
    the move to its (local) minimum (ref: gpmin.py main loop).

    phi_fn: optional descriptor map (e.g. `inv_dist_descriptor`) — the GP
    is then fit in descriptor space like the reference GPmin (gpmin.py:223
    inverse distances with the Jacobian chain rule :240; here the chain
    rule is jax autodiff through phi_fn, and observed gradients transform
    by the Jacobian least squares g_phi = (J J^T)^-1 J g_x)."""
    if phi_fn is None:
        obs_x, obs_g = x, gradient
    else:
        obs_x = phi_fn(x)
        jac = jax.jacfwd(phi_fn)(x)                  # (P, D)
        jjt = jac @ jac.T
        from multioptpy_tpu.ops.eigh64 import solve_f64safe
        obs_g = solve_f64safe(
            jjt + 1e-10 * jnp.eye(jjt.shape[0], dtype=x.dtype),
            jac @ gradient, assume_sym=True)
    m = state.x_hist.shape[0]
    slot = state.count % m
    state = GpState(
        x_hist=state.x_hist.at[slot].set(obs_x),
        e_hist=state.e_hist.at[slot].set(energy),
        g_hist=state.g_hist.at[slot].set(obs_g),
        count=state.count + 1,
    )

    if phi_fn is None:
        surrogate = lambda q: gp_posterior_energy(q, state, lengthscale)
    else:
        surrogate = lambda q: gp_posterior_energy(phi_fn(q), state,
                                                  lengthscale)
    surrogate_grad = jax.grad(surrogate)

    def body(_, q):
        return q - rate * surrogate_grad(q)

    q = jax.lax.fori_loop(0, n_descent, body, x)
    move = q - x
    norm = jnp.linalg.norm(move)
    move = jnp.where(norm > max_step,
                     move * (max_step / jnp.maximum(norm, 1e-30)), move)
    # fall back to steepest descent until the GP has >= 2 observations
    move = jnp.where(state.count >= 2, move, -rate * gradient)
    return move, state
