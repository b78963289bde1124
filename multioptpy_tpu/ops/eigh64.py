"""Seeded f64 symmetric eigensolver for TPU: f32 seed + f64 Jacobi polish.

The TPU has no native f64 ALU; XLA emulates f64 op-by-op, so the QR-pipeline
`eigh` custom call and long iterative chains (Newton-Schulz, CG, bisection)
become hundreds of tiny sequential emulated kernels — the round-3 profile of
the f64 SQM+RFO step put 96% of the 0.86 ms/structure step in that chain.

This solver cuts the f64 critical path to O(d) small ops:

  1. SEED (f32): diagonalize `a.astype(f32)` with the fast f32 path —
     the single-kernel Pallas lane-parallel Jacobi on TPU
     (`ops/jacobi_pallas.py`), XLA `eigh` elsewhere. Eigenvector error
     ~1e-7 (any orthonormal basis of a near-degenerate cluster is an
     equally good seed).
  2. ORTHONORMALIZE (f64): one Newton step V <- V (3I - V^T V)/2 pushes
     the f32 off-orthogonality ~1e-7 to ~1e-14.
  3. POLISH (f64): A1 = V^T A V is diagonal to ~1e-7; ONE round-robin
     Jacobi sweep (`ops.jacobi.jacobi_sweeps`) converges quadratically
     from there (off-diagonals ~1e-14), two sweeps are insurance. The
     rotations accumulate into V, so a ~= V diag(w) V^T to f64 accuracy.

Unlike running the full f64 Jacobi on TPU (which drifts over the ~100-round
chain of emulated matmuls — the guard in `ops/jacobi.py`), the polish runs
only d-1 or 2(d-1) rounds from an almost-diagonal start, so emulation error
cannot accumulate.  Verified against LAPACK to ~1e-13 on random, degenerate,
and near-degenerate batches (tests/test_eigh64.py).
"""

from functools import partial

import jax
import jax.numpy as jnp

from multioptpy_tpu.ops.jacobi import jacobi_sweeps


def _seed_eigh_f32(a32):
    """f32 eigendecomposition: Pallas lane-parallel Jacobi on TPU, XLA
    elsewhere (LAPACK on CPU is already a single fast call)."""
    if jax.default_backend() == "tpu":
        from multioptpy_tpu.ops.jacobi_pallas import jacobi_eigh_pallas_auto

        return jacobi_eigh_pallas_auto(a32, sweeps=8)
    return jnp.linalg.eigh(a32)


@partial(jax.jit, static_argnames=("polish_sweeps",))
def _seeded_eigh_batched(a, polish_sweeps=2):
    """The (B, D, D) implementation behind `seeded_eigh`."""
    batch_shape = a.shape[:-2]
    d0 = a.shape[-1]
    a = a.reshape((-1, d0, d0))
    dtype = a.dtype

    # pad to even dimension with an isolated above-spectrum eigenvalue
    # (same trick as ops/jacobi.py; it sorts last and is stripped)
    d = d0 + (d0 % 2)
    if d != d0:
        pad = jnp.zeros((a.shape[0], d, d), dtype)
        pad = pad.at[:, :d0, :d0].set(a)
        big = 1.0 + d0 * jnp.max(jnp.abs(a))
        pad = pad.at[:, d0, d0].set(big)
        a = pad

    hi = jax.lax.Precision.HIGHEST
    _, v32 = _seed_eigh_f32(a.astype(jnp.float32))
    v = v32.astype(dtype)

    # one Newton orthonormalization step: ||V^T V - I|| 1e-7 -> ~1e-14
    eye = jnp.eye(d, dtype=dtype)
    vtv = jnp.einsum("bji,bjk->bik", v, v, precision=hi)
    v = jnp.einsum("bij,bjk->bik", v, 1.5 * eye - 0.5 * vtv, precision=hi)

    # rotate A into the seed basis: nearly diagonal
    av = jnp.einsum("bij,bjk->bik", a, v, precision=hi)
    a1 = jnp.einsum("bji,bjk->bik", v, av, precision=hi)
    a1 = 0.5 * (a1 + jnp.swapaxes(a1, -1, -2))

    a1, v = jacobi_sweeps(a1, v, polish_sweeps)

    w = jnp.diagonal(a1, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    w = w[:, :d0]
    v = v[:, :d0, :d0]
    return (w.reshape(*batch_shape, d0),
            v.reshape(*batch_shape, d0, d0))


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=None)
def _cv_seeded(polish_sweeps):
    """custom_vmap wrapper: `vmap` of the unbatched call maps onto the
    implementation's own batch axis (whose f32 seed is the Pallas kernel's
    native lane batch) instead of trying to batch `pallas_call`."""

    @jax.custom_batching.custom_vmap
    def f(a):
        w, v = _seeded_eigh_batched(a[None], polish_sweeps)
        return w[0], v[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, a):
        del axis_size, in_batched
        w, v = _seeded_eigh_batched(a, polish_sweeps)
        return (w, v), (True, True)

    return f


def seeded_eigh(a, polish_sweeps=2):
    """Eigendecomposition of symmetric f64 a (..., D, D), ascending
    eigenvalues; returns (w, v) with a = v @ diag(w) @ v.T — the
    jnp.linalg.eigh convention. Composes with jit and (one level of)
    vmap: unbatched inputs route through a custom_vmap wrapper whose
    batch rule feeds the implementation's native batch axis."""
    if a.ndim > 2:
        return _seeded_eigh_batched(a, polish_sweeps=polish_sweeps)
    return _cv_seeded(polish_sweeps)(a)


def eigh_fast(a, polish_sweeps=2):
    """The one eigh entry point the f64 device hot paths (SQM band
    energy, EEQ solve, S^-1/2, RFO, IRC, vibrations) should call.

    Currently = jnp.linalg.eigh on every backend: the round-3 production
    A/B on v5e (f64 SQM+RFO 64x water, /tmp-era measurements recorded in
    NOTES.md) found the current libtpu's emulated f64 QR eigh BEATS the
    seeded f32+polish solver at every shape tried — in-step 0.290 (XLA)
    vs 0.484 (seeded SQM paths) vs 0.690 (seeded everywhere)
    ms/structure/step, and standalone 0.08 vs 46 ms at (64,10,10),
    31-41 vs 42-70 ms at d 24-72. The f64 throughput win that matters
    came from the closed forms below (one factorization + exact JVPs
    replacing Newton-Schulz/CG/double-eigh chains), which are
    eigh-backend-agnostic. `seeded_eigh` stays available as an explicit
    fallback should a future libtpu regress the emulated QR path."""
    del polish_sweeps
    return jnp.linalg.eigh(a)


def eigh_deflated(h_proj, p, shift=1e3):
    """Eigendecomposition of a TR/rot-PROJECTED symmetric matrix that is
    safe on the TPU's float-float-emulated f64 QR eigh.

    `h_proj = P^T H P` has an exactly 6-fold-degenerate zero eigenvalue
    block (the projected-out subspace), which is precisely the structure
    that makes the emulated QR produce NaNs (measured on the flagship
    Diels-Alder TS: `normal_modes` and IRC's `mass_weighted_modes` both
    NaN'd on TPU while the raw unprojected eigh was clean). Adding
    `shift * (I - P)` moves that block to an isolated eigenvalue far
    above the physical spectrum WITHOUT touching the eigenvectors:
    h_proj and (I - P) commute (complementary supports), so the shifted
    operator has the same eigenbasis, with the projected-out modes at
    `shift` instead of 0. After the solve, each eigenvalue is restored by
    subtracting shift * (v_k^T (I-P) v_k) — exactly shift for TR/rot
    modes, ~1e-14*shift for physical ones — and the pairs re-sorted.

    Returns (w, v) ascending, with projected-out modes back at ~0.
    """
    eye = jnp.eye(h_proj.shape[-1], dtype=h_proj.dtype)
    w, v = eigh_fast(h_proj + shift * (eye - p))
    q = 1.0 - jnp.einsum("...ik,...ik->...k", v,
                         jnp.matmul(p, v, precision=jax.lax.Precision.HIGHEST))
    w = w - shift * q
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


@jax.custom_jvp
def eigh_solve(a, b):
    """Solve the symmetric (possibly indefinite) system a @ x = b through
    one `eigh_fast` factorization: x = V (V^T b / w) V-basis. The custom
    JVP reuses the factorization for the tangent solve
    dx = A^-1 (db - dA x) — implicit-function rule, degeneracy-safe (no
    eigen-derivatives appear), and the tangents enter linearly so JAX can
    transpose it for reverse mode. Replaces the 3*dim-iteration CG chain
    on the f64 TPU path (ref of the system being solved: the bordered EEQ
    electronegativity-equalization matrix, SQM/sqm2/sqm2_eeq.py)."""
    w, v = eigh_fast(a)
    return v @ ((jnp.swapaxes(v, -1, -2) @ b) / w)


@eigh_solve.defjvp
def _eigh_solve_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    w, v = eigh_fast(a)
    vt = jnp.swapaxes(v, -1, -2)

    def solve(r):
        return v @ ((vt @ r) / w)

    x = solve(b)
    dx = solve(db - da @ x)
    return x, dx


@jax.custom_jvp
def inv_sqrt_psd(s, floor=1e-12):
    """S^{-1/2} of a symmetric PSD matrix via one `eigh_fast` call:
    V w^{-1/2} V^T with eigenvalues floored at `floor` * max(w).

    The custom JVP is the Daleckii-Krein Frechet derivative
    d(S^-1/2) = V (F * (V^T dS V)) V^T with the loewner matrix for
    f(w) = w^-1/2 written in its algebraically exact cancellation-free
    form  F_ij = -1 / (sqrt(w_i) sqrt(w_j) (sqrt(w_i) + sqrt(w_j))),
    which at i = j reduces to f'(w) = -w^-3/2 / 2 — smooth through
    eigenvalue degeneracies (the reason the energy path previously used a
    34-iteration Newton-Schulz chain; this replaces it on the f64 TPU
    path at ~1/8 the sequential op count)."""
    w, v = eigh_fast(s)
    w = jnp.maximum(w, floor * jnp.max(w, axis=-1, keepdims=True))
    return (v * (w[..., None, :] ** -0.5)) @ jnp.swapaxes(v, -1, -2)


@inv_sqrt_psd.defjvp
def _inv_sqrt_psd_jvp(primals, tangents):
    s, floor = primals
    ds, _ = tangents
    w, v = eigh_fast(s)
    w = jnp.maximum(w, floor * jnp.max(w, axis=-1, keepdims=True))
    vt = jnp.swapaxes(v, -1, -2)
    sq = jnp.sqrt(w)
    f_loewner = -1.0 / (sq[..., :, None] * sq[..., None, :]
                        * (sq[..., :, None] + sq[..., None, :]))
    y = (v * (w[..., None, :] ** -0.5)) @ vt
    dy = v @ (f_loewner * (vt @ ds @ v)) @ vt
    return y, dy


def solve_f64safe(a, b, assume_sym=False):
    """`jnp.linalg.solve` that lowers on TPU in float64.

    The TPU backend implements LuDecomposition only for F32/C64, so any
    f64 `jnp.linalg.solve`/`inv` inside a jitted on-device program fails
    AOT compilation (observed: the rsirfo_block_* window solves,
    hessian/block_updates.py). In that regime route through one seeded
    symmetric eigendecomposition: directly for symmetric systems, via the
    normal equations (A^T A) x = A^T b for general ones — the windows
    these solves act on are small (DIIS/multisecant K x K) and Tikhonov-
    regularized by their callers, so the squared condition number is
    benign. CPU / f32 keep the LAPACK-path solve bit-for-bit.
    """
    if a.dtype == jnp.float64 and jax.default_backend() != "cpu":
        if assume_sym:
            m, rhs = 0.5 * (a + jnp.swapaxes(a, -1, -2)), b
        else:
            at = jnp.swapaxes(a, -1, -2)
            m, rhs = at @ a, at @ b
        w, v = eigh_fast(m)
        # Pseudo-inverse guard: the seeded solver's eigenvalue error is
        # ~1e-13 relative, so components at/below that scale can come back
        # with the wrong sign or magnitude where LU pivoting degrades
        # gracefully. Clamp |w| away from zero (sign preserved) at a
        # relative floor before dividing.
        wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
        floor = 1e-12 * jnp.maximum(wmax, 1e-300)
        w = jnp.where(jnp.abs(w) < floor,
                      jnp.where(w < 0, -floor, floor), w)
        vb = jnp.swapaxes(v, -1, -2) @ rhs
        if rhs.ndim == m.ndim:          # matrix right-hand side
            return v @ (vb / w[..., :, None])
        return v @ (vb / w)
    return jnp.linalg.solve(a, b)
