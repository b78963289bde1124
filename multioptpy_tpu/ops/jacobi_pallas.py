"""Pallas TPU kernel: batched small-matrix symmetric eigensolver.

Motivation (round-2 wall-clock bisection, NOTES.md): in the production
batched RS-RFO step the eigensolve is ~96% of the step time. The XLA
round-robin Jacobi (`ops/jacobi.py`) already reformulates each round as
two batched matmuls, but a (256, 24, 24) round is ~40 KFLOP — the 5.3
ms/iter it costs is pure op-dispatch/relayout overhead across the
138-round sequential chain, not compute.

This kernel runs the ENTIRE Jacobi iteration inside one `pallas_call`:

  * layout: the matrix batch is transposed to (D, D, B) so the BATCH is
    the lane dimension — every Givens rotation becomes a handful of
    (D, 128) elementwise FMAs on the VPU, perfectly shaped, entirely in
    VMEM (a (24, 24, 128) working set is ~0.3 MB).
  * a pair update is two row rotations followed by two column rotations
    (G A G^T staged as (G A) then (. G^T)), with the rotation angles
    computed per lane from the pair's diagonal/off-diagonal entries —
    the same stable small-root Givens formula as ops/jacobi.py.
  * the round-robin pairing is computed in scalar registers (circle
    method closed form); sweeps x rounds x pairs
    are `fori_loop`s, so there is ZERO per-round dispatch overhead and no
    bf16-matmul-precision issue (no matmuls at all — full-f32 VPU math).

Grid: one program per 128-lane batch tile. Eigenvalue ordering + the
final transpose back to (B, D, D) happen outside the kernel (tiny).
"""

from functools import partial

import jax
import jax.numpy as jnp



_LANES = 128


def _kernel(a_ref, w_ref, v_ref, a_scr, v_scr, *, d, n_rounds, sweeps):
    a_scr[:] = a_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
    eye = jnp.where(row == col, 1.0, 0.0).astype(a_ref.dtype)
    v_scr[:] = jnp.broadcast_to(eye, (d, d, _LANES))

    def pair_body(k, r):
        import jax.experimental.pallas as pl

        # circle-method pairing computed in scalar registers (a
        # precomputed (d-1, d/2, 2) table would live in SMEM, whose 1 MiB
        # window budget overflows at d ~ 64 — seen at the 18-atom SQM2
        # band, d = 72). Same pairs as ops/jacobi._round_robin_schedule:
        # index 0 is the fixed player; at round r the rotating ring
        # places 1 + ((i - 1 - r) mod (d-1)) at seat i, and pair k
        # matches seats k and d-1-k.
        m = jnp.int32(d - 1)
        q = 1 + (m - 1 - k - r + 2 * m) % m
        p = jnp.where(k == 0, 0, 1 + (k - 1 - r + m) % m)

        rp = a_scr[pl.ds(p, 1), :, :].reshape(d, _LANES)
        rq = a_scr[pl.ds(q, 1), :, :].reshape(d, _LANES)
        app = a_scr[pl.ds(p, 1), pl.ds(p, 1), :].reshape(_LANES)
        aqq = a_scr[pl.ds(q, 1), pl.ds(q, 1), :].reshape(_LANES)
        apq = a_scr[pl.ds(p, 1), pl.ds(q, 1), :].reshape(_LANES)

        # stable small-root Givens angle (same math as ops/jacobi.py).
        # sign(0) must be +1, NOT 0: equal diagonal entries with a
        # significant off-diagonal need the full 45-degree rotation —
        # overlap matrices (all-ones diagonal) hit this on every pair
        # and were silently left undiagonalized (round-3 eht bisection)
        small = jnp.abs(apq) < 1e-30
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        t = -sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c                        # (LANES,)

        # stage 1: M = G A  (rows p, q; G[p,q] = s, G[q,p] = -s)
        a_scr[pl.ds(p, 1), :, :] = (c * rp + s * rq)[None]
        a_scr[pl.ds(q, 1), :, :] = (-s * rp + c * rq)[None]

        # stage 2: A' = M G^T  (columns p, q)
        cp = a_scr[:, pl.ds(p, 1), :]    # (d, 1, LANES)
        cq = a_scr[:, pl.ds(q, 1), :]
        a_scr[:, pl.ds(p, 1), :] = c * cp + s * cq
        a_scr[:, pl.ds(q, 1), :] = -s * cp + c * cq

        # eigenvectors: V' = V G^T (columns p, q)
        vp = v_scr[:, pl.ds(p, 1), :]
        vq = v_scr[:, pl.ds(q, 1), :]
        v_scr[:, pl.ds(p, 1), :] = c * vp + s * vq
        v_scr[:, pl.ds(q, 1), :] = -s * vp + c * vq
        return r

    # int32 loop bounds throughout: under jax_enable_x64 plain Python ints
    # become i64, and Mosaic rejects 64-bit induction variables
    # ("Check failed: bitwidth_ <= 32" — hit when the f64 seeded solver
    # calls this kernel from an x64 program)
    i32 = lambda x: jnp.asarray(x, jnp.int32)  # noqa: E731

    def round_body(r, _):
        jax.lax.fori_loop(i32(0), i32(d // 2), pair_body, r)
        return _

    def sweep_body(_s, _):
        jax.lax.fori_loop(i32(0), i32(n_rounds), round_body, i32(0))
        # re-symmetrize once per sweep: the staged row/column updates round
        # A[p,j] and A[j,p] differently in f32; without this the asymmetric
        # drift occasionally corrupts a spectrum (the XLA jacobi
        # symmetrizes every round, ops/jacobi.py)
        a_scr[:] = 0.5 * (a_scr[:] + jnp.swapaxes(a_scr[:], 0, 1))
        return _

    jax.lax.fori_loop(i32(0), i32(sweeps), sweep_body, i32(0))

    for i in range(d):                   # static unroll: diag extraction
        w_ref[i, :] = a_scr[i, i, :]
    v_ref[:] = v_scr[:]


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def jacobi_eigh_pallas(a, sweeps=7, interpret=False):
    """Eigendecomposition of symmetric a (..., D, D), ascending eigenvalues;
    returns (w, v) with a = v @ diag(w) @ v.T — same convention as
    jnp.linalg.eigh / ops/jacobi.jacobi_eigh. f32 only (the VPU math is
    full f32; use jnp.linalg.eigh for f64).

    The body traces under `jax.enable_x64(False)`: Mosaic rejects the
    64-bit index/iota types an x64 tracing context produces ("Check
    failed: bitwidth_ <= 32" in the TPU compiler), and the f64 seeded
    solver (ops/eigh64.py) calls this kernel from inside x64 programs.
    Inputs/outputs are f32 either way, so the emitted kernel is identical
    to the x64-off build."""
    with jax.enable_x64(False):
        return _jacobi_eigh_pallas_impl(a, sweeps, interpret)


def _jacobi_eigh_pallas_impl(a, sweeps, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = a.shape[:-2]
    d0 = a.shape[-1]
    a = a.reshape((-1, d0, d0))
    b0 = a.shape[0]
    dtype = a.dtype

    d = d0 + (d0 % 2)
    if d != d0:
        pad = jnp.zeros((b0, d, d), dtype)
        pad = pad.at[:, :d0, :d0].set(a)
        big = 1.0 + d0 * jnp.max(jnp.abs(a))
        pad = pad.at[:, d0, d0].set(big)
        a = pad

    b = ((b0 + _LANES - 1) // _LANES) * _LANES
    if b != b0:
        # inert identity padding in the batch
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(d, dtype=dtype),
                                 (b - b0, d, d))], axis=0)

    a_t = jnp.transpose(a, (1, 2, 0))                  # (d, d, B)

    kernel = partial(_kernel, d=d, n_rounds=d - 1, sweeps=sweeps)
    w_t, v_t = pl.pallas_call(
        kernel,
        grid=(b // _LANES,),
        in_specs=[
            pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, b), dtype),
            jax.ShapeDtypeStruct((d, d, b), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, d, _LANES), dtype),
            pltpu.VMEM((d, d, _LANES), dtype),
        ],
        interpret=interpret,
    )(a_t)

    w = jnp.transpose(w_t, (1, 0))[:b0]                # (B, d)
    v = jnp.transpose(v_t, (2, 0, 1))[:b0]             # (B, d, d)

    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    w = w[:, :d0]
    v = v[:, :d0, :d0]
    return (w.reshape(*batch_shape, d0),
            v.reshape(*batch_shape, d0, d0))


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=None)
def _cv_eigh(sweeps):
    """custom_vmap wrapper: `vmap` of the unbatched call maps onto the
    kernel's own lane-batch axis instead of trying to batch `pallas_call`
    (which would pad every element to a 128-lane tile of its own)."""

    @jax.custom_batching.custom_vmap
    def f(h):
        w, v = jacobi_eigh_pallas(h[None], sweeps=sweeps)
        return w[0], v[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, h):
        del axis_size, in_batched
        w, v = jacobi_eigh_pallas(h, sweeps=sweeps)
        return (w, v), (True, True)

    return f


_PALLAS_MAX_D = 32


def jacobi_eigh_pallas_auto(h, sweeps=7):
    """jacobi_eigh_pallas that composes with `jax.vmap`: unbatched (D, D)
    inputs go through a custom_vmap wrapper whose batch rule feeds the
    kernel's native batch axis; already-batched inputs call it directly.

    Dimension gate: the kernel's sequential chain grows as sweeps*d^2/2
    pair rotations per 128-lane tile, so past d ~ 32 it loses to the XLA
    QR eigh even in-scan (measured v5e: d=24 in the production RFO scan
    pallas 0.0059 vs xla 0.050 ms/structure/step — 8.4x win; unbatched
    d=72 pallas 51 ms vs xla ~0.1 ms — 500x loss). Above the gate this
    returns jnp.linalg.eigh."""
    if h.shape[-1] > _PALLAS_MAX_D:
        return jnp.linalg.eigh(h)
    if h.ndim > 2:
        return jacobi_eigh_pallas(h, sweeps=sweeps)
    return _cv_eigh(sweeps)(h)
