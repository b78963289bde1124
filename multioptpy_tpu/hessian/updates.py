"""Quasi-Newton Hessian update rules as branchless, batched pure functions.

Formula parity with the reference engine
(ref: multioptpy/Optimizer/hessian_update.py:22-440) but every `if denom <
eps` guard becomes `jnp.where`, so a rule is one fused XLA kernel of rank-1/
rank-2 outer products that jits and vmaps over a leading ensemble axis —
ensembles of structures update their Hessians in one batched call (the
reference updates one structure at a time in Python).

Conventions: s = displacement (x_new - x_old), y = delta_grad (g_new -
g_old), both flat (D,); `h` is the current (D, D) Hessian approximation.
Every rule returns delta_H with H_new = H + delta_H.

References: FSB/Bofill: Farkas & Schlegel, JCP 111, 10806 (1999).
MSP: Anglada et al., THEOCHEM 591, 35 (2002). CFD: JCTC 9, 54 (2013).
Double damping: arXiv:2006.08877. Flowchart: Theor Chem Acc 135, 84 (2016).
"""

import jax.numpy as jnp

_DENOM_EPS = 1e-10   # reference's absolute guard (ref: hessian_update.py:26)
_REL_EPS = 1e-12     # relative degeneracy threshold (see note below)
_TINY = 1e-300


def _safe_div(num, den, scale):
    """num/den, zero when |den| is degenerate RELATIVE to its natural scale.

    The reference zeroes individual update terms on an absolute |den|<1e-10
    test (ref: hessian_update.py:50-62). That silently corrupts updates on
    weak-force surfaces (e.g. dispersion-bound LJ clusters) where s.y ~ 1e-11
    is perfectly meaningful: one BFGS term gets zeroed while the other
    survives, injecting a spurious -s s^T/|s|^2 curvature that cancels the
    diagonal and freezes the optimizer along s. A scale-relative test keeps
    every physically meaningful pair and only rejects true degeneracies.
    """
    ok = jnp.abs(den) >= _REL_EPS * scale + _TINY
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def bfgs_delta(h, s, y):
    """delta = y y^T/(y.s) - (H s)(H s)^T/(s.H s)
    (ref: hessian_update.py:35 _calculate_bfgs_delta). The whole delta is
    zeroed if EITHER denominator is degenerate — zeroing only one term is
    never a valid update."""
    hs = h @ s
    sy = jnp.dot(s, y)
    shs = jnp.dot(s, hs)
    ok = ((jnp.abs(sy) >= _REL_EPS * _norm(s) * _norm(y) + _TINY)
          & (jnp.abs(shs) >= _REL_EPS * _norm(s) * _norm(hs) + _TINY))
    t1 = jnp.outer(y, y) / jnp.where(ok, sy, 1.0)
    t2 = jnp.outer(hs, hs) / jnp.where(ok, shs, 1.0)
    return jnp.where(ok, t1 - t2, 0.0)


def _norm(x):
    return jnp.linalg.norm(x)


def _sr1_delta_from_a(a, s):
    return _safe_div(jnp.outer(a, a), jnp.dot(a, s), _norm(a) * _norm(s))


def sr1_delta(h, s, y):
    """delta = a a^T/(a.s), a = y - H s (ref: hessian_update.py:67)."""
    return _sr1_delta_from_a(y - h @ s, s)


def psb_delta(h, s, y):
    """Powell symmetric Broyden (ref: hessian_update.py:88)."""
    a = y - h @ s
    ss = jnp.dot(s, s)
    ok = ss >= _TINY
    ss_safe = jnp.where(ok, ss, 1.0)
    term = (-jnp.dot(a, s) * jnp.outer(s, s) / ss_safe ** 2
            + (jnp.outer(a, s) + jnp.outer(s, a)) / ss_safe)
    return jnp.where(ok, term, 0.0)


def _bofill_const(a, s):
    """phi^2 = (a.s)^2 / ((a.a)(s.s)) (ref: hessian_update.py:110)."""
    num = jnp.dot(a, s) ** 2
    den = jnp.dot(a, a) * jnp.dot(s, s)
    return jnp.clip(_safe_div(num, den, den + _TINY), 0.0, 1.0)


def fsb_delta(h, s, y, cfd=False):
    """Farkas-Schlegel-Bofill: sqrt(phi^2)-weighted SR1/BFGS mix
    (ref: hessian_update.py:263 FSB, :274 CFD-FSB)."""
    a = (2.0 if cfd else 1.0) * (y - h @ s)
    d_sr1 = _sr1_delta_from_a(a, s)
    d_bfgs = bfgs_delta(h, s, y)
    phi = jnp.sqrt(jnp.clip(_bofill_const(a, s), 0.0, 1.0))
    return (1.0 - phi) * d_bfgs + phi * d_sr1


def bofill_delta(h, s, y, cfd=False):
    """Bofill: phi^2-weighted SR1/PSB mix (ref: hessian_update.py:286,:298)."""
    a = (2.0 if cfd else 1.0) * (y - h @ s)
    d_sr1 = _sr1_delta_from_a(a, s)
    d_psb = psb_delta(h, s, y)
    c = _bofill_const(a, s)
    return (1.0 - c) * d_psb + c * d_sr1


def msp_delta(h, s, y):
    """Murtagh-Sargent-Powell: sin^2-weighted SR1/PSB mix
    (ref: hessian_update.py:345)."""
    a = y - h @ s
    d_ms = _sr1_delta_from_a(a, s)
    d_p = psb_delta(h, s, y)
    den = jnp.linalg.norm(a) * jnp.linalg.norm(s)
    cos_arg = jnp.clip(_safe_div(jnp.dot(s, a), den, den + _TINY), -1.0, 1.0)
    phi = 1.0 - cos_arg ** 2
    return phi * d_p + (1.0 - phi) * d_ms


def flowchart_delta(h, s, y):
    """Auto-select SR1/BFGS/FSB per step (ref: hessian_update.py:163; Theor
    Chem Acc 135, 84 (2016)). Branchless: all three deltas are formed and the
    winner selected with `where` — for 3N-sized molecular Hessians the extra
    outer products are noise next to the eigh that follows.

    Keeps the reference's z = y - H y convention (a deliberate deviation from
    the paper's y - H s, noted at hessian_update.py:167-169).
    """
    z = y - h @ y
    den_z = jnp.linalg.norm(s) * jnp.linalg.norm(z)
    den_y = jnp.linalg.norm(s) * jnp.linalg.norm(y)
    zs = _safe_div(jnp.dot(z, s), den_z, den_z + _TINY)
    ys = _safe_div(jnp.dot(y, s), den_y, den_y + _TINY)
    d_sr1 = sr1_delta(h, s, y)
    d_bfgs = bfgs_delta(h, s, y)
    d_fsb = fsb_delta(h, s, y)
    return jnp.where(zs < -0.1, d_sr1, jnp.where(ys > 0.1, d_bfgs, d_fsb))


def double_damping(s, y, mu2=0.2):
    """Powell damping of y with B=I ("DD step 2",
    ref: hessian_update.py:200 double_damping_step2_only). Returns y_tilde."""
    sy = jnp.dot(s, y)
    ss = jnp.dot(s, s)
    den = ss - sy
    theta2 = jnp.where(jnp.abs(den) >= _DENOM_EPS,
                       (1.0 - mu2) * ss / jnp.where(jnp.abs(den) >= _DENOM_EPS, den, 1.0),
                       0.1)
    theta2 = jnp.clip(theta2, 0.0, 1.0)
    return jnp.where(sy < mu2 * ss, theta2 * y + (1.0 - theta2) * s, y)


def auto_scale(h, s, y, is_identity):
    """Initial-identity scaling H <- H * (y.y)/(y.s) (Nocedal & Wright eq
    6.20; ref: hessian_update.py:136). `is_identity` is a traced bool."""
    ss = jnp.dot(s, s)
    yy = jnp.dot(y, y)
    ys = jnp.abs(jnp.dot(y, s))
    # relative degeneracy test (see _safe_div note): the reference's absolute
    # 1e-10 floors (hessian_update.py:148) reject valid weak-force pairs
    ok = (ss > _TINY) & (yy > _TINY) & (ys > _REL_EPS * jnp.sqrt(ss * yy))
    scale = jnp.where(ok & is_identity, yy / jnp.where(ok, ys, 1.0), 1.0)
    return h * scale


def pcfd_bofill_delta(h, s, y):
    """Perturbed CFD-Bofill (ref: hessian_update.py:309
    pCFD_Bofill_hessian_update): the CFD-Bofill delta plus the
    orthogonal-complement perturbation. The reference's O(N^2) double loop
    over an explicit null-space basis of s collapses to the closed form

        sum_ij (v_j^T D v_i)(v_i v_j^T + v_j v_i^T) = 2 P D P

    with P = I - s s^T / |s|^2 (D symmetric)."""
    d = bofill_delta(h, s, y, cfd=True)
    s2 = jnp.dot(s, s)
    ok = s2 > 1e-300
    p = jnp.eye(s.shape[0], dtype=s.dtype) - jnp.outer(s, s) / jnp.where(
        ok, s2, 1.0)
    return jnp.where(ok, d + 2.0 * (p @ d @ p), d)


UPDATE_RULES = {
    "bfgs": bfgs_delta,
    "bfgs_dd": lambda h, s, y: bfgs_delta(h, s, double_damping(s, y)),
    "sr1": sr1_delta,
    "psb": psb_delta,
    "fsb": fsb_delta,
    "fsb_dd": lambda h, s, y: fsb_delta(h, s, double_damping(s, y)),
    "cfd_fsb": lambda h, s, y: fsb_delta(h, s, y, cfd=True),
    "cfd_fsb_dd": lambda h, s, y: fsb_delta(h, s, double_damping(s, y), cfd=True),
    "bofill": bofill_delta,
    "cfd_bofill": lambda h, s, y: bofill_delta(h, s, y, cfd=True),
    "pcfd_bofill": pcfd_bofill_delta,
    "msp": msp_delta,
    "flowchart": flowchart_delta,
    "auto": flowchart_delta,
}


def update_hessian(h, s, y, method="auto"):
    """H + delta_H by named rule; symmetrized. Jit-safe for static `method`."""
    rule = UPDATE_RULES[method]
    h_new = h + rule(h, s, y)
    return 0.5 * (h_new + h_new.T)
