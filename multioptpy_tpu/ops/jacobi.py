"""Batched symmetric eigensolver: parallel cyclic Jacobi as matmuls.

XLA:TPU's `eigh` lowers to a QR-iteration pipeline with a long sequential
critical path — the dominant cost of the batched RS-RFO step (NOTES.md).
For the small (3N, 3N) Hessians this framework diagonalizes by the
thousands, a two-sided Jacobi with a ROUND-ROBIN ordering is a much better
fit for the hardware: each round applies D/2 mutually disjoint Givens
rotations, which compose into ONE block rotation matrix, so a whole round
is two batched (B, D, D) matmuls on the MXU. A sweep is D-1 rounds; ~8-12
sweeps reach f32 machine precision. Everything is fixed-trip-count, so it
jits, vmaps, and shards.

The round-robin schedule is the standard polygon method: fix index 0,
rotate the rest; every round pairs all D indices disjointly.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n):
    """(n-1, n/2, 2) static pairing schedule (n even)."""
    assert n % 2 == 0
    others = list(range(1, n))
    rounds = []
    for _ in range(n - 1):
        ring = [0] + others
        pairs = [(ring[i], ring[n - 1 - i]) for i in range(n // 2)]
        rounds.append(sorted(tuple(sorted(p)) for p in pairs))
        others = [others[-1]] + others[:-1]
    return np.asarray(rounds, dtype=np.int32)


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(a, sweeps=10):
    """Eigendecomposition of symmetric a (..., D, D), ascending eigenvalues.

    Returns (w, v) with a = v @ diag(w) @ v.T (same convention as
    jnp.linalg.eigh). D is padded to even internally.

    f64-on-TPU guard: the TPU's f64 matmul emulation drifts the Jacobi
    similarity transforms enough to corrupt the spectrum (NOTES.md round-1
    perf deep-dive), so that combination silently falls back to
    jnp.linalg.eigh — Jacobi is a THROUGHPUT optimization for the f32
    batched path, never worth wrong answers.
    """
    if a.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        import warnings

        warnings.warn(
            "jacobi_eigh: f64 on a non-CPU backend drifts the spectrum "
            "(TPU f64 matmul emulation); falling back to jnp.linalg.eigh.",
            RuntimeWarning, stacklevel=2)
        return jnp.linalg.eigh(a)
    batch_shape = a.shape[:-2]
    d0 = a.shape[-1]
    a = a.reshape((-1, d0, d0))
    dtype = a.dtype

    # pad to even dimension with an inert identity block
    d = d0 + (d0 % 2)
    if d != d0:
        pad = jnp.zeros((a.shape[0], d, d), dtype)
        pad = pad.at[:, :d0, :d0].set(a)
        # isolated eigenvalue above the Gershgorin bound -> sorts last
        big = 1.0 + d0 * jnp.max(jnp.abs(a))
        pad = pad.at[:, d0, d0].set(big)
        a = pad

    v0 = jnp.tile(jnp.eye(d, dtype=dtype)[None], (a.shape[0], 1, 1))
    a, v = jacobi_sweeps(a, v0, sweeps)

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)

    w = w[:, :d0]
    v = v[:, :d0, :d0]
    return (w.reshape(*batch_shape, d0),
            v.reshape(*batch_shape, d0, d0))


def jacobi_sweeps(a, v, sweeps):
    """The round-robin Jacobi core: `sweeps` full sweeps of disjoint Givens
    rotations on batched symmetric a (B, d, d) (d even), accumulating the
    similarity transform into v (B, d, d). Returns (a, v) with the input
    a ~= v @ a_out @ v.T. Shared by `jacobi_eigh` (identity v0) and the
    seeded f64 polish (`ops.eigh64`, f32-seed v0)."""
    d = a.shape[-1]
    dtype = a.dtype
    schedule = _round_robin_schedule(d)  # (d-1, d/2, 2)
    n_rounds = schedule.shape[0]
    p_idx = jnp.asarray(schedule[:, :, 0])
    q_idx = jnp.asarray(schedule[:, :, 1])
    eye = jnp.eye(d, dtype=dtype)

    def one_round(carry, r):
        a, v = carry
        p = p_idx[r]  # (d/2,)
        q = q_idx[r]
        app = a[:, p, p]              # (B, d/2)
        aqq = a[:, q, q]
        apq = a[:, p, q]

        # Givens angle zeroing a_pq under a' = G A G^T with this G layout:
        # t^2 - 2 tau t - 1 = 0, stable (small) root
        # t = -sign(tau)/(|tau| + sqrt(1+tau^2))
        #
        # "small" is RELATIVE: once |apq| is below ~1e-18 of the diagonal
        # scale the rotation is below f64 resolution anyway, and computing
        # tau would overflow. On CPU that overflow is a graceful IEEE
        # inf -> t = 0; the TPU's float-float f64 emulation is NOT
        # inf-safe (inf - inf inside the compensated ops -> NaN, seen in
        # the eigh64 polish's 2nd sweep where off-diagonals hit ~1e-30),
        # so the clamp below keeps tau finite outright.
        small = (jnp.abs(apq) < 1e-30) | (
            jnp.abs(apq) <= 1e-18 * (jnp.abs(app) + jnp.abs(aqq)))
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        tau = jnp.clip(tau, -1e15, 1e15)
        # sign convention: tau = 0 (EQUAL diagonal entries, significant
        # apq) needs the full 45-degree rotation t = -1 — jnp.sign(0) = 0
        # would skip the pair forever. Overlap matrices hit this on every
        # pair (all diagonals exactly 1), which left S undiagonalized and
        # S^-1/2 = I on the TPU seeded path (round-3 eht bisection).
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        t = -sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c

        # block rotation G: diag entries c at p and q, +s at (p,q), -s at (q,p)
        g = jnp.tile(eye[None], (a.shape[0], 1, 1))
        g = g.at[:, p, p].set(c)
        g = g.at[:, q, q].set(c)
        g = g.at[:, p, q].set(s)
        g = g.at[:, q, p].set(-s)

        # HIGHEST precision: the TPU's default bf16 matmul passes stall
        # Jacobi at ~1e-1 accuracy; full-f32 passes reach the f32 floor
        a = jnp.einsum("bij,bjk,blk->bil", g, a, g,
                       preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        # re-symmetrize drift
        a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
        v = jnp.einsum("bij,bjk->bik", v, jnp.swapaxes(g, -1, -2),
                       preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        return (a, v), None

    def one_sweep(carry, _):
        return jax.lax.scan(one_round, carry,
                            jnp.arange(n_rounds))[0], None

    (a, v), _ = jax.lax.scan(one_sweep, (a, v), None, length=sweeps)
    return a, v
