"""Batched parallel-Jacobi eigensolver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multioptpy_tpu.ops import jacobi_eigh


@pytest.mark.parametrize("d", [6, 9, 24])
def test_matches_reference(rng, d):
    a = rng.standard_normal((3, d, d))
    a = jnp.asarray(a + np.transpose(a, (0, 2, 1)))
    w, v = jacobi_eigh(a, sweeps=12)
    np.testing.assert_allclose(np.asarray(w),
                               np.linalg.eigvalsh(np.asarray(a)), atol=1e-10)
    recon = np.einsum("bij,bj,bkj->bik", np.asarray(v), np.asarray(w),
                      np.asarray(v))
    np.testing.assert_allclose(recon, np.asarray(a), atol=1e-10)


def test_degenerate_and_diagonal(rng):
    d = np.diag([1.0, 1.0, 2.0, 2.0, 2.0, 5.0])[None]
    w, v = jacobi_eigh(jnp.asarray(d), sweeps=6)
    np.testing.assert_allclose(np.asarray(w)[0], [1, 1, 2, 2, 2, 5],
                               atol=1e-12)


def test_grad_through_eigenvalues(rng):
    # eigenvalue sums are differentiable through the Jacobi iteration
    a = rng.standard_normal((4, 4))
    a = jnp.asarray(a + a.T)

    def lowest(m):
        w, _ = jacobi_eigh(m[None], sweeps=10)
        return w[0, 0]

    g = jax.grad(lowest)(a)
    eps = 1e-6
    fd = (lowest(a.at[0, 1].add(eps).at[1, 0].add(eps))
          - lowest(a.at[0, 1].add(-eps).at[1, 0].add(-eps))) / (2 * eps)
    assert float(g[0, 1] + g[1, 0]) == pytest.approx(float(fd), rel=1e-4)
