"""N-dimensional hyperspherical (polar) coordinates.

ref: multioptpy/Coordinate/polar_coordinate.py:4-176 — used by the SHS-style
searches to parametrize sphere surfaces. Pure JAX, differentiable, with the
analytic Jacobian via `jax.jacfwd`.
"""

import jax
import jax.numpy as jnp


def cart2polar(point, reference_point=None):
    """(n,) cartesian -> (n,) [r, theta_1..theta_{n-2}, phi]."""
    if reference_point is not None:
        point = point - reference_point
    n = point.shape[0]
    r = jnp.linalg.norm(point)

    def angle(i):
        norm_partial = jnp.sqrt(jnp.sum(point[i:] ** 2) + 1e-30)
        return jnp.arccos(jnp.clip(point[i] / norm_partial, -1.0, 1.0))

    thetas = jnp.stack([angle(i) for i in range(n - 2)]) if n > 2 else \
        jnp.zeros((0,), point.dtype)
    phi = jnp.arctan2(point[-1], point[-2])
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    return jnp.concatenate([jnp.array([r], point.dtype), thetas,
                            jnp.array([phi], point.dtype)])


def polar2cart(polar, reference_point=None):
    """Inverse transform."""
    r = polar[0]
    angles = polar[1:]
    n = polar.shape[0]
    coords = []
    sin_prod = r
    for i in range(n - 1):
        coords.append(sin_prod * jnp.cos(angles[i]))
        sin_prod = sin_prod * jnp.sin(angles[i])
    coords.append(sin_prod)
    out = jnp.stack(coords)
    if reference_point is not None:
        out = out + reference_point
    return out


def polar_jacobian(polar, reference_point=None):
    """d cart / d polar, (n, n), via forward-mode autodiff (the reference
    derives it analytically, polar_coordinate.py:80+)."""
    return jax.jacfwd(lambda p: polar2cart(p, reference_point))(polar)


def cart_grad_to_polar_grad(x, grad_x, reference_point=None):
    """grad_p = J^T grad_x with J = d cart/d polar at p = cart2polar(x)
    (ref: polar_coordinate.py:176 cart_grad_2_polar_grad — whose first
    Jacobian column is broken upstream: compute_analytical_jacobian calls
    cart2polar on a POLAR vector where polar2cart is meant, so its
    dx/dr column is cart2polar(p)/r instead of x/r; pinned live by
    tests/test_reference_live12.py)."""
    p = cart2polar(x, reference_point)
    jac = polar_jacobian(p, reference_point)
    return jac.T @ grad_x
