"""Seeded f64 eigensolver + eigh-based closed forms (ops/eigh64.py).

These are the building blocks that collapse the f64-on-TPU sequential
emulation chain (round-3 profile: the f64 SQM gradient was 96% of the
0.86 ms step). On CPU the seed is XLA f32 eigh instead of the Pallas
kernel, but the f64 polish/JVP code under test is identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multioptpy_tpu.ops.eigh64 import (eigh_solve, inv_sqrt_psd,
                                       seeded_eigh)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", True)


def _rand_sym(rng, b, d):
    a = rng.standard_normal((b, d, d))
    return a + np.swapaxes(a, -1, -2)


def test_seeded_eigh_random_batch():
    rng = np.random.default_rng(1)
    a = _rand_sym(rng, 6, 9)
    w, v = seeded_eigh(jnp.asarray(a))
    assert np.max(np.abs(np.asarray(w) - np.linalg.eigvalsh(a))) < 1e-11
    rec = np.einsum("bij,bj,bkj->bik", np.asarray(v), np.asarray(w),
                    np.asarray(v))
    assert np.max(np.abs(rec - a)) < 1e-11
    orth = np.einsum("bji,bjk->bik", np.asarray(v), np.asarray(v))
    assert np.max(np.abs(orth - np.eye(9))) < 1e-12


def test_seeded_eigh_degenerate_cluster():
    """Exactly and nearly degenerate eigenvalues: the f32 seed mixes the
    cluster arbitrarily; the f64 polish must still deliver an accurate
    spectrum and an orthonormal reconstruction."""
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    wdeg = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0 + 1e-9, 5.0])
    a = (q * wdeg) @ q.T
    w, v = seeded_eigh(jnp.asarray(a))
    assert np.max(np.abs(np.asarray(w) - np.sort(wdeg))) < 1e-11
    rec = np.asarray(v) @ np.diag(np.asarray(w)) @ np.asarray(v).T
    # within-cluster mixing bounds reconstruction by the 1e-9 gap
    assert np.max(np.abs(rec - a)) < 5e-9


def test_seeded_eigh_vmap_and_odd_dim():
    rng = np.random.default_rng(3)
    a = _rand_sym(rng, 4, 7)  # odd dimension exercises the padding
    w, v = jax.vmap(lambda m: seeded_eigh(m))(jnp.asarray(a))
    assert np.max(np.abs(np.asarray(w) - np.linalg.eigvalsh(a))) < 1e-11


def test_eigh_solve_indefinite_and_grad():
    rng = np.random.default_rng(4)
    a = _rand_sym(rng, 1, 9)[0]  # indefinite symmetric
    b = rng.standard_normal(9)
    x = eigh_solve(jnp.asarray(a), jnp.asarray(b))
    assert np.max(np.abs(np.asarray(x) - np.linalg.solve(a, b))) < 1e-10

    g = jax.grad(lambda m: jnp.sum(eigh_solve(m, jnp.asarray(b)) ** 2))(
        jnp.asarray(a))
    dirm = rng.standard_normal((9, 9))
    fval = lambda t: np.sum(np.linalg.solve(a + t * dirm, b) ** 2)
    fd = (fval(1e-7) - fval(-1e-7)) / 2e-7
    an = float(jnp.sum(g * jnp.asarray(dirm)))
    assert abs(an - fd) / max(abs(fd), 1.0) < 1e-7


def test_inv_sqrt_psd_degenerate_grad():
    """Daleckii-Krein JVP through an EXACT eigenvalue degeneracy — the
    case plain eigh autodiff NaNs on and the cancellation-free Loewner
    form handles smoothly."""
    import scipy.linalg as sla

    rng = np.random.default_rng(5)
    q, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    s = (q * np.array([1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 5.0])) @ q.T
    y = inv_sqrt_psd(jnp.asarray(s))
    yr = sla.inv(sla.sqrtm(s)).real
    assert np.max(np.abs(np.asarray(y) - yr)) < 1e-11

    g = jax.grad(lambda m: jnp.sum(inv_sqrt_psd(m) ** 3))(jnp.asarray(s))
    assert np.all(np.isfinite(np.asarray(g)))
    dirm = rng.standard_normal((8, 8))
    dirm = dirm + dirm.T
    fvs = lambda t: np.sum(sla.inv(sla.sqrtm(s + t * dirm)).real ** 3)
    fd = (fvs(1e-6) - fvs(-1e-6)) / 2e-6
    an = float(jnp.sum(g * jnp.asarray(dirm)))
    assert abs(an - fd) / max(abs(fd), 1.0) < 1e-6


def test_inv_sqrt_matches_newton_schulz():
    """The f64 energy path switched from the 34-iteration Newton-Schulz
    chain to the eigh-based S^-1/2; both must agree to f64 accuracy on a
    representative overlap-like SPD matrix."""
    from multioptpy_tpu.calculators.sqm import _inv_sqrt_newton_schulz

    rng = np.random.default_rng(6)
    m = rng.standard_normal((10, 10)) * 0.3
    s = np.eye(10) + 0.5 * (m + m.T) @ (m + m.T).T  # SPD, overlap-scaled
    y_eigh = np.asarray(inv_sqrt_psd(jnp.asarray(s)))
    y_ns = np.asarray(_inv_sqrt_newton_schulz(jnp.asarray(s)))
    assert np.max(np.abs(y_eigh - y_ns)) < 1e-9


def test_fermi_mixed_precision_matches_full_bisection():
    """The f64 Fermi path (f32 bisection + clamped f64 Newton) must give
    the same mu/occupations as a pure-f64 bisection, including the
    mid-gap case where n(mu) is exponentially flat."""
    from multioptpy_tpu.calculators.sqm import _fermi_occupations

    eps = jnp.asarray(
        [-0.9, -0.52, -0.515, -0.51, -0.1, 0.3, 0.31], jnp.float64)
    kt = 1e-3
    for n_elec in (4.0, 6.0, 7.0):
        occ, mu = _fermi_occupations(eps, n_elec, kt)
        # ground truth: 200-iteration f64 bisection
        lo, hi = float(jnp.min(eps)) - 1.0, float(jnp.max(eps)) + 1.0
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            n_mid = float(jnp.sum(2.0 * jax.nn.sigmoid(-(eps - mid) / kt)))
            if n_mid < n_elec:
                lo = mid
            else:
                hi = mid
        occ_ref = 2.0 * jax.nn.sigmoid(-(eps - 0.5 * (lo + hi)) / kt)
        assert float(jnp.sum(occ)) == pytest.approx(n_elec, abs=1e-9)
        assert np.max(np.abs(np.asarray(occ - occ_ref))) < 1e-9


def test_seeded_eigh_near_diagonal_tiny_offdiag():
    """Regression: a matrix whose off-diagonals are ~1e-30 of the diagonal
    scale makes the Givens tau overflow. IEEE arithmetic degrades that to
    t = 0 gracefully, but the TPU's float-float f64 emulation is not
    inf-safe (NaN observed in the polish's 2nd sweep on device) — the
    relative small-rotation threshold + tau clamp in ops/jacobi.py must
    keep every stage finite."""
    d = 8
    a = np.diag(np.linspace(1.0, 9.0, d))
    a = a + 1e-30 * (np.ones((d, d)) - np.eye(d))
    w, v = seeded_eigh(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(w)))
    assert np.all(np.isfinite(np.asarray(v)))
    np.testing.assert_allclose(np.asarray(w), np.linspace(1.0, 9.0, d),
                               rtol=1e-12)


def test_seeded_eigh_overlap_like_equal_diagonal():
    """Regression (round-3 eht bisection): overlap matrices have EVERY
    diagonal entry exactly 1, so tau = 0 on every pair and jnp.sign(0) = 0
    silently skipped every rotation — the Jacobi paths returned V = I and
    S^-1/2 = I, leaving the Hamiltonian unwhitened on the TPU f64 path.
    The sign convention must rotate 45 degrees at tau = 0."""
    import scipy.linalg as sla

    from multioptpy_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(12)
    m = rng.standard_normal((6, 6)) * 0.25
    s = np.eye(6) + 0.4 * (m + m.T) / 2
    np.fill_diagonal(s, 1.0)  # exact all-ones diagonal, SPD-ish overlap
    w_ref = np.linalg.eigvalsh(s)

    w_j, v_j = jacobi_eigh(jnp.asarray(s)[None], sweeps=12)
    np.testing.assert_allclose(np.asarray(w_j)[0], w_ref, atol=1e-12)

    w_s, v_s = seeded_eigh(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(w_s), w_ref, atol=1e-11)

    y = inv_sqrt_psd(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(y), sla.inv(sla.sqrtm(s)).real,
                               atol=1e-10)


class TestEigh64RescuedBatching:
    """The f64-on-TPU QR eigh NaN rescue (steppers/rfo.py:_eigh64_rescued)
    must stay CONDITIONAL under vmap. A plain lax.cond inside a vmapped
    step lowers to select (both branches execute for the whole batch),
    which made the production 64-structure f64 step run the seeded rescue
    solver unconditionally — 0.098 -> 0.307 ms/structure/step measured on
    v5e. custom_vmap's batch rule reduces the failure flag over the batch
    instead."""

    def test_unbatched_matches_eigh(self):
        from multioptpy_tpu.steppers.rfo import _eigh64_rescued
        rng = np.random.default_rng(3)
        m = rng.standard_normal((7, 7))
        h = jnp.asarray((m + m.T) / 2)
        w, v = _eigh64_rescued(h)
        w0, v0 = jnp.linalg.eigh(h)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w0), atol=1e-13)
        np.testing.assert_allclose(np.abs(np.asarray(v)),
                                   np.abs(np.asarray(v0)), atol=1e-12)

    def test_vmap_matches_per_element(self):
        from multioptpy_tpu.steppers.rfo import _eigh64_rescued
        rng = np.random.default_rng(4)
        m = rng.standard_normal((5, 6, 6))
        h = jnp.asarray((m + np.swapaxes(m, -1, -2)) / 2)
        w, v = jax.vmap(_eigh64_rescued)(h)
        for i in range(5):
            wi, vi = jnp.linalg.eigh(h[i])
            np.testing.assert_allclose(np.asarray(w[i]), np.asarray(wi),
                                       atol=1e-13)
            np.testing.assert_allclose(np.abs(np.asarray(v[i])),
                                       np.abs(np.asarray(vi)), atol=1e-12)
        # reconstruction check: V diag(w) V^T == H
        rec = jnp.einsum("bij,bj,bkj->bik", v, w, v)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(h),
                                   atol=1e-12)

    def test_vmap_keeps_rescue_conditional(self):
        """The batched jaxpr must contain a real `cond` primitive (the
        scalar any-over-batch gate), not an unconditional inlined rescue."""
        from multioptpy_tpu.steppers.rfo import _eigh64_rescued
        h = jnp.zeros((4, 6, 6), jnp.float64)
        jaxpr = jax.make_jaxpr(jax.vmap(_eigh64_rescued))(h)
        assert "cond" in str(jaxpr)
