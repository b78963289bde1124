"""Restricted-step (image-function) rational-function-optimization steps.

TPU-native redesign of the reference's RS-I-RFO engine
(ref: multioptpy/Optimizer/rsirfo.py:285 run, :924 get_rs_step, :1374/:1505
secular solvers, :1688 solve_rfo). Differences that matter on TPU:

* ONE eigendecomposition per step. The reference builds the image projector
  P = I - 2 sum v v^T from the Hessian's own eigenvectors and re-diagonalizes
  H* = P H (rsirfo.py:404-433). But H* shares H's eigenvectors with the
  selected eigenvalues negated, so the flip is done directly on (eigvals,
  g-components) — the second O(D^3) eigh is algebraically redundant.
* Branchless fixed-iteration solvers. brentq/Newton micro-cycles with
  data-dependent exits (rsirfo.py:1374,:1505) become fixed-trip-count
  bisection `lax.fori_loop`s: the secular equation f(lam) = lam + sum
  g_i^2/(d_i - lam) is strictly increasing left of the first pole, so
  bisection converges unconditionally, the same number of iterations in every
  vmap lane, to f64 machine precision in ~80 halvings.
* Everything is shaped for `vmap`: no dynamic filtering of small eigenvalues
  (the reference drops columns, rsirfo.py:265) — excluded modes are masked to
  zero contribution instead, keeping static shapes.

All functions are pure; drivers carry (trust_radius, hessian, ...) in a
pytree state.
"""

from functools import partial

import jax
import jax.numpy as jnp

_POLE_EPS = 1e-10          # mode participates in image flip (ref rsirfo.py:415)
SMALL_EIGVAL_THRESH = 1e-6  # mode excluded from step (ref rsirfo.py:26)


def _leftmost_secular_root(poles, g2, valid, n_iter=80):
    """Smallest root of f(lam) = lam + sum_i g2_i / (poles_i - lam).

    `valid` masks which terms participate. f is strictly increasing on
    (-inf, p0) where p0 = min over valid poles with g2 > 0, with
    f -> -inf / +inf at the ends, so the unique root there is found by
    bisection with a guaranteed initial bracket.
    """
    dtype = poles.dtype
    gnorm2 = jnp.sum(jnp.where(valid, g2, 0.0))
    # A pole only bounds the root if its gradient component carries signal.
    # Quasi-Newton Hessians grow spurious small negative eigenvalues whose
    # g-components are numerical noise (~1e-9 of ||g||); letting such a pole
    # pin lambda makes the step ride a fake mode and stalls minimizations
    # near stiff walls. Relative cutoff: |g_i| > 1e-5 ||g||.
    active = valid & (g2 > jnp.maximum(1e-24, 1e-10 * gnorm2))
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    p0 = jnp.min(jnp.where(active, poles, big))
    # Bracket: root <= min(p0, 0) (augmented-matrix interlacing); choose the
    # lower end far enough that f(a) < 0:  a = min(p0,0) - (||g|| + 1).
    b = jnp.minimum(p0, 0.0)
    a = b - (jnp.sqrt(gnorm2) + 1.0)

    def f(lam):
        den = poles - lam
        safe = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
        return lam + jnp.sum(jnp.where(active, g2 / safe, 0.0))

    def body(_, ab):
        lo, hi = ab
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        return (jnp.where(fm < 0.0, mid, lo), jnp.where(fm < 0.0, hi, mid))

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (a, b))
    return 0.5 * (lo + hi)


def _rfo_step_components(eigvals, g_t, valid, alpha):
    """Step components in the eigenbasis for scaling parameter alpha
    (ref: rsirfo.py:1688 solve_rfo). Returns (step_t, lam)."""
    poles = eigvals / alpha
    gt = g_t / alpha
    lam = _leftmost_secular_root(poles, gt * gt, valid)
    den = poles - lam
    safe = jnp.where(jnp.abs(den) > 1e-20, den, jnp.where(den >= 0, 1e-20, -1e-20))
    step_t = jnp.where(valid, -gt / safe, 0.0)
    return step_t, lam


def _rfo_step_grid(d_im, g_im, valid, trust_radius, alpha0=1.0,
                   alpha_max=1000.0, n_grid=24):
    """Trust-radius restriction via a PARALLEL log-grid of alpha values.

    The reference (and the textbook RS-RFO) root-finds alpha sequentially
    (rsirfo.py:1505 brentq + Newton micro-cycles). Under `vmap`, `lax.cond`
    lowers to `select`, so a sequential bisection (40 outer x 80 inner
    iterations) sits on EVERY batched step's critical path — ~3000
    dependent vector ops. Here all alpha candidates are evaluated at once
    (one vmapped secular solve, sequential depth = one secular bisection)
    and the largest step not exceeding the trust radius wins; the winner is
    then exactly rescaled onto the boundary. 50x shorter critical path for
    sub-0.3% step-direction differences.
    """
    alphas = jnp.concatenate([
        jnp.asarray([alpha0], d_im.dtype),
        jnp.logspace(-6.0, jnp.log10(alpha_max), n_grid - 1,
                     dtype=d_im.dtype)])

    step_all, lam_all = jax.vmap(
        lambda a: _rfo_step_components(d_im, g_im, valid, a))(alphas)
    norms = jnp.linalg.norm(step_all, axis=1)

    # alpha0's step if it fits; otherwise the largest-norm step that still
    # fits; otherwise the smallest-norm step clipped onto the boundary
    fits = norms <= trust_radius
    none_fit = ~jnp.any(fits)
    best_fit = jnp.argmax(jnp.where(fits, norms, -jnp.inf))
    smallest = jnp.argmin(norms)
    idx = jnp.where(fits[0], 0, jnp.where(none_fit, smallest, best_fit))
    step = step_all[idx]
    lam = lam_all[idx]
    sn = norms[idx]
    step = jnp.where(sn > trust_radius,
                     step * (trust_radius / jnp.maximum(sn, 1e-30)), step)
    return step, lam


@jax.custom_batching.custom_vmap
def _eigh64_rescued(h):
    """f64-on-TPU QR eigh with a NaN rescue through the seeded solver.

    Unbatched: lax.cond executes the rescue only on failure. Batched (see
    the def_vmap rule): the flag is reduced over the batch, so the common
    all-finite case costs one batched QR eigh plus a scalar check."""
    d0, v0 = jnp.linalg.eigh(h)
    bad = ~(jnp.all(jnp.isfinite(d0)) & jnp.all(jnp.isfinite(v0)))

    def _rescue(_):
        from multioptpy_tpu.ops.eigh64 import seeded_eigh
        return seeded_eigh(h)

    return jax.lax.cond(bad, _rescue, lambda _: (d0, v0), None)


@_eigh64_rescued.def_vmap
def _eigh64_rescued_vmap(axis_size, in_batched, h):
    d0, v0 = jnp.linalg.eigh(h)
    bad_each = ~(jnp.all(jnp.isfinite(d0), axis=-1)
                 & jnp.all(jnp.isfinite(v0), axis=(-2, -1)))

    def _rescue(_):
        from multioptpy_tpu.ops.eigh64 import seeded_eigh
        w, v = seeded_eigh(h)
        sel = bad_each[..., None]
        return (jnp.where(sel, w, d0), jnp.where(sel[..., None], v, v0))

    out = jax.lax.cond(jnp.any(bad_each), _rescue, lambda _: (d0, v0), None)
    return out, (in_batched[0], in_batched[0])


def _eigh(h, impl):
    """Symmetric eigendecomposition dispatch:

    "xla"    — the EighTpu custom call (11.1 ms per batched (256,24,24)
               f32 eigh on v5e).
    "jacobi" — ops/jacobi.py batched round-robin Jacobi as XLA matmuls
               (5.6 ms: 2x over EighTpu, still dispatch-bound across the
               138-round chain).
    "pallas" — ops/jacobi_pallas.py: the ENTIRE Jacobi iteration inside one
               TPU kernel, batch on the lane dimension, rotations as VPU
               row/column FMAs in VMEM (0.78 ms — 7x over the XLA Jacobi,
               14x over EighTpu, same f32 accuracy floor). Falls back to
               "jacobi" off-TPU or in f64 (the kernel is f32 VPU math).

    The sweep count grows logarithmically with dimension (cyclic Jacobi
    needs ~log(D) extra sweeps past the small-D floor; D=24 -> 6-7)."""
    import numpy as _np

    d = h.shape[-1]
    sweeps = 5 + max(0, int(_np.ceil(_np.log2(max(d, 16) / 16.0))))
    if h.dtype == jnp.float64 and jax.default_backend() == "tpu":
        # f64 on TPU, ANY impl: the emulated XLA QR eigh. Measured faster
        # than both the matmul Jacobi (which also drifts, ops/jacobi.py
        # guard) and the seeded f32+polish solver at production shapes —
        # see ops/eigh64.eigh_fast for the A/B numbers.
        #
        # NaN rescue: the float-float emulation inside the QR solver is
        # not inf-safe and returns all-NaN for some perfectly finite,
        # well-conditioned inputs (observed on the flagship Diels-Alder
        # refinement: a 54x54 TR/rot-projected Hessian NaN'd while the
        # same matrix, re-rounded through numpy, solved fine). Without the
        # rescue, rs_rfo_step's NaN guard silently degraded those steps to
        # identity-Hessian moves and the refinement random-walked uphill
        # on TPU while CPU converged (round-3 session-4 diagnosis). The
        # fixed-sweep seeded solver (f32 Pallas seed + f64 polish) handles
        # those matrices (residual ~2e-10). custom_vmap keeps the rescue
        # conditional under vmap too: a batched lax.cond lowers to select
        # (both branches run for the whole batch), which tripled the
        # production 64-structure f64 step; the batch rule instead reduces
        # the failure flag over the batch so the seeded solver only
        # executes when some member actually NaN'd.
        return _eigh64_rescued(h)
    if impl == "pallas":
        if h.dtype == jnp.float32 and jax.default_backend() == "tpu":
            from multioptpy_tpu.ops.jacobi_pallas import (
                jacobi_eigh_pallas_auto)
            return jacobi_eigh_pallas_auto(h, sweeps=sweeps + 1)
        impl = "jacobi"
    if impl == "jacobi":
        from multioptpy_tpu.ops.jacobi import jacobi_eigh
        return jacobi_eigh(h, sweeps=sweeps)
    return jnp.linalg.eigh(h)


@partial(jax.jit, static_argnames=("saddle_order", "n_alpha_iter",
                                   "eigh_impl"))
def rs_rfo_step(gradient, hessian, trust_radius, saddle_order=0,
                alpha0=1.0, alpha_max=1000.0, n_alpha_iter=40,
                eigh_impl="xla"):
    """One restricted-step image-RFO step.

    Parameters
    ----------
    gradient : (D,) flat gradient (TR/rot-projected by the caller).
    hessian : (D, D) symmetric effective Hessian (bias included, projected).
    trust_radius : scalar, same length unit as the geometry (Bohr internally).
    saddle_order : static int n — seek an n-th order saddle by sign-flipping
        the n lowest non-singular modes (image function, ref rsirfo.py:404).

    Returns
    -------
    step : (D,) move vector, norm <= trust_radius (+tolerance)
    aux : dict(predicted_energy_change, lambda, step_norm)
    """
    d, v = _eigh(0.5 * (hessian + hessian.T), eigh_impl)
    # NaN guard: broken Hessian falls back to identity => steepest descent
    # (ref: rsirfo.py:362-370)
    bad = ~jnp.all(jnp.isfinite(d)) | ~jnp.all(jnp.isfinite(v))
    d = jnp.where(bad, jnp.ones_like(d), d)
    v = jnp.where(bad, jnp.eye(d.shape[0], dtype=v.dtype), v)

    g_t = v.T @ gradient

    # image flip of the first saddle_order non-singular modes
    participate = jnp.abs(d) > _POLE_EPS
    rank = jnp.cumsum(participate.astype(jnp.int32))
    flip = participate & (rank <= saddle_order)
    sign = jnp.where(flip, -1.0, 1.0)
    d_im = d * sign
    g_im = g_t * sign

    # modes excluded from the step entirely (ref: rsirfo.py:265 filter)
    valid = jnp.abs(d) >= SMALL_EIGVAL_THRESH

    step_t, lam = _rfo_step_grid(d_im, g_im, valid, trust_radius,
                                 alpha0, alpha_max)

    step = v @ step_t

    # final NaN guard -> trust-clipped steepest descent (ref: rsirfo.py:455)
    finite = jnp.all(jnp.isfinite(step))
    sd = -gradient
    sd_n = jnp.linalg.norm(sd)
    sd = jnp.where(sd_n > trust_radius, sd * (trust_radius / jnp.maximum(sd_n, 1e-30)), sd)
    step = jnp.where(finite, step, sd)

    predicted = jnp.dot(gradient, step) + 0.5 * jnp.dot(step, hessian @ step)
    return step, {"predicted_energy_change": predicted, "lambda": lam,
                  "step_norm": jnp.linalg.norm(step)}


def update_trust_radius(trust_radius, actual_change, predicted_change,
                        tr_min=0.01, tr_max=0.5, good=0.75, poor=0.25,
                        increase=1.2, decrease=0.5, overshoot=2.0):
    """Conventional ratio-based trust-radius control as a pure function
    (ref: rsirfo.py:805 adjust_trust_radius; optimizer.py:534).

    Unlike the reference's rule, the accept band is TWO-SIDED: a ratio far
    ABOVE 1 (|actual| >> |predicted|) is just as much a model failure as a
    ratio below `poor` — during saddle refinement (where uphill motion is
    legal and downhill rejection is off) a one-sided rule reads a
    catastrophic under-prediction as "excellent" and keeps the radius
    pinned while the energy runs away 0.3 Ha (round-3 flagship diagnosis:
    40 consecutive steps at exactly the trust bound)."""
    ok = jnp.abs(predicted_change) >= 1e-10
    ratio = jnp.where(ok, actual_change / jnp.where(ok, predicted_change, 1.0), 1.0)
    grown = jnp.minimum(trust_radius * increase, tr_max)
    shrunk = jnp.maximum(trust_radius * decrease, tr_min)
    new = jnp.where((ratio > good) & (ratio < overshoot), grown,
                    jnp.where((ratio < poor) | (ratio > overshoot),
                              shrunk, trust_radius))
    return jnp.where(ok, new, trust_radius)


def _rightmost_secular_root(poles, g2, valid, n_iter=80):
    """Largest root of f(lam) = lam - sum_i g2_i / (lam - poles_i):
    the P-RFO maximization shift. By symmetry it is -leftmost(-poles, g2)."""
    return -_leftmost_secular_root(-poles, g2, valid, n_iter)


def _prfo_step_components(eigvals, g_t, max_mask, valid, alpha):
    """Partitioned-RFO step in the eigenbasis: the `max_mask` modes are
    maximized (shift above their poles), the rest minimized (shift below).
    ref: Optimizer/rsprfo.py:16 EnhancedRSPRFO."""
    poles = eigvals / alpha
    gt = g_t / alpha
    g2 = gt * gt

    lam_max = _rightmost_secular_root(poles, g2, valid & max_mask)
    lam_min = _leftmost_secular_root(poles, g2, valid & ~max_mask)

    den_max = poles - lam_max
    den_min = poles - lam_min
    safe = lambda d: jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))
    step_max = -gt / safe(den_max)
    step_min = -gt / safe(den_min)
    step_t = jnp.where(valid, jnp.where(max_mask, step_max, step_min), 0.0)
    return step_t, lam_min, lam_max


@partial(jax.jit, static_argnames=("saddle_order", "n_alpha_iter",
                                   "eigh_impl"))
def rs_prfo_step(gradient, hessian, trust_radius, saddle_order=1,
                 alpha0=1.0, alpha_max=1000.0, n_alpha_iter=40,
                 follow_vector=None, eigh_impl="xla"):
    """Restricted-step partitioned RFO for transition states: maximize along
    the `saddle_order` lowest modes, minimize along the rest (Banerjee 1985;
    ref: Optimizer/rsprfo.py EnhancedRSPRFO). Same trust-radius alpha
    bisection as rs_rfo_step.

    follow_vector: optional (D,) mode-following reference — the maximized
    mode is the eigenvector with the LARGEST overlap with it instead of the
    lowest one (ref: Optimizer/mf_rsirfo.py:6 mode following). The chosen
    eigenvector (sign-aligned) is returned in aux["followed_mode"] for the
    caller to carry to the next step."""
    d, v = _eigh(0.5 * (hessian + hessian.T), eigh_impl)
    bad = ~jnp.all(jnp.isfinite(d)) | ~jnp.all(jnp.isfinite(v))
    d = jnp.where(bad, jnp.ones_like(d), d)
    v = jnp.where(bad, jnp.eye(d.shape[0], dtype=v.dtype), v)
    g_t = v.T @ gradient

    participate = jnp.abs(d) > _POLE_EPS
    rank = jnp.cumsum(participate.astype(jnp.int32))
    if follow_vector is None:
        max_mask = participate & (rank <= saddle_order)
        followed = v[:, jnp.argmax(max_mask)]
    else:
        ovl = v.T @ follow_vector
        score = jnp.where(participate, jnp.abs(ovl), -jnp.inf)
        idx = jnp.argmax(score)
        max_mask = jnp.arange(d.shape[0]) == idx
        followed = v[:, idx] * jnp.sign(ovl[idx])
    valid = jnp.abs(d) >= SMALL_EIGVAL_THRESH

    step0, lam_min, lam_max = _prfo_step_components(d, g_t, max_mask, valid,
                                                    alpha0)
    norm0 = jnp.linalg.norm(step0)

    def restrict(_):
        lo0 = jnp.log10(jnp.asarray(1e-6, d.dtype))
        hi0 = jnp.log10(jnp.asarray(alpha_max, d.dtype))

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            s, _, _ = _prfo_step_components(d, g_t, max_mask, valid,
                                            10.0 ** mid)
            too_big = jnp.linalg.norm(s) > trust_radius
            return (jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid))

        lo, hi = jax.lax.fori_loop(0, n_alpha_iter, body, (lo0, hi0))
        s, lmin, lmax = _prfo_step_components(d, g_t, max_mask, valid,
                                              10.0 ** (0.5 * (lo + hi)))
        sn = jnp.linalg.norm(s)
        s = jnp.where(sn > trust_radius,
                      s * (trust_radius / jnp.maximum(sn, 1e-30)), s)
        return s, lmin, lmax

    step_t, lam_min, lam_max = jax.lax.cond(
        norm0 > trust_radius, restrict,
        lambda _: (step0, lam_min, lam_max), operand=None)

    step = v @ step_t
    finite = jnp.all(jnp.isfinite(step))
    sd = -gradient
    sd_n = jnp.linalg.norm(sd)
    sd = jnp.where(sd_n > trust_radius,
                   sd * (trust_radius / jnp.maximum(sd_n, 1e-30)), sd)
    step = jnp.where(finite, step, sd)
    predicted = jnp.dot(gradient, step) + 0.5 * jnp.dot(step, hessian @ step)
    return step, {"predicted_energy_change": predicted,
                  "lambda_min": lam_min, "lambda_max": lam_max,
                  "step_norm": jnp.linalg.norm(step),
                  "followed_mode": followed}


@partial(jax.jit, static_argnames=("mode",))
def rfo_classic_step(gradient, hessian, mode="min"):
    """Unrestricted classic RFO step from the augmented Hessian
    [[H, g], [g^T, 0]]: step = x[:-1]/x[-1] for the smallest (min) /
    largest (max) eigenpair. Used by the NEB RFO optimizer
    (ref: Optimizer/rfo_neb.py:10) and as a cheap fallback."""
    n = gradient.shape[0]
    aug = jnp.zeros((n + 1, n + 1), dtype=hessian.dtype)
    aug = aug.at[:n, :n].set(0.5 * (hessian + hessian.T))
    aug = aug.at[:n, n].set(gradient)
    aug = aug.at[n, :n].set(gradient)
    w, u = jnp.linalg.eigh(aug)
    idx = 0 if mode == "min" else n
    vec = u[:, idx]
    denom = vec[n]
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, jnp.where(denom >= 0, 1e-12, -1e-12))
    return vec[:n] / safe
