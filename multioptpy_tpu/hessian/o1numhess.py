"""O(1)-gradient seminumerical Hessians.

ref: multioptpy/ModelHessian/o1numhess.py (656 LoC; arXiv 2508.07544
"O1NumHess"): an accurate Hessian from only a few gradient evaluations by
combining a model-Hessian prior with exact curvature information along a
small set of probe directions.

Here: k probe directions v_i (model-Hessian eigenvectors of the softest
modes by default — where model priors are least reliable), the exact
curvature H v_i from central differences, and symmetric secant (PSB)
corrections that make the result match every measured pair exactly while
leaving the prior untouched in the unprobed subspace. All 2k probe
gradients evaluate in ONE vmapped backend call (the reference runs them
serially).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multioptpy_tpu.hessian.updates import psb_delta


def o1numhess(calc, coords, z, n_probes=6, step=1e-3, prior=None,
              directions=None):
    """-> (3N, 3N) Hessian from 2*n_probes gradient calls + a prior.

    prior: (3N,3N) model Hessian (default: Lindh guess).
    directions: optional (k, 3N) probe directions (orthonormalized here).
    """
    coords = jnp.asarray(coords)
    n3 = coords.size
    if prior is None:
        from multioptpy_tpu.hessian.model import model_hessian
        prior = model_hessian(coords, np.asarray(z), kind="lindh")
    prior = jnp.asarray(prior)

    if directions is None:
        # softest prior modes carry the largest model error
        w, v = jnp.linalg.eigh(prior)
        order = jnp.argsort(jnp.abs(w))
        directions = v.T[order[:n_probes]]
    else:
        directions = jnp.asarray(directions)[:n_probes]
    # orthonormalize
    q, _ = jnp.linalg.qr(directions.T)
    dirs = q.T  # (k, 3N)

    flat = coords.reshape(-1)
    plus = (flat[None, :] + step * dirs).reshape(-1, *coords.shape)
    minus = (flat[None, :] - step * dirs).reshape(-1, *coords.shape)
    both = jnp.concatenate([plus, minus], axis=0)

    grad_fn = lambda x: calc.energy_and_gradient(x, z)[1].reshape(-1)
    grads = jax.vmap(grad_fn)(both)
    k = dirs.shape[0]
    hv = (grads[:k] - grads[k:]) / (2.0 * step)  # (k, 3N) exact H v_i

    # sequential symmetric secant corrections: after each, H s = y exactly
    h = prior
    for i in range(k):
        s = dirs[i]
        y = hv[i]
        h = h + psb_delta(h, s, y)
        h = 0.5 * (h + h.T)
    return h
