"""Multi-secant (block) quasi-Newton Hessian updates.

ref: multioptpy/Optimizer/block_hessian_update.py:23 BlockHessianUpdate —
block BFGS/SR1/PSB/FSB/Bofill over a sliding window of (s, y) pairs
(block_size=4, max_window=8 in the reference :443-710). Here the window is a
static-shape circular buffer (W, D) with column masking, so the whole update
is a handful of small dense solves that jit and vmap; invalid/degenerate
windows fall back to the rank-2 rule automatically.

Block forms (S, Y are (D, w) with w valid columns):
  BFGS:  dH = Y (Y^T S)^-1 Y^T - H S (S^T H S)^-1 S^T H
  SR1:   dH = R (R^T S)^-1 R^T,  R = Y - H S
  PSB:   dH = R V^T + V R^T - V (R^T S) V^T,  V = S (S^T S)^-1
"""

from typing import NamedTuple

import jax.numpy as jnp

from multioptpy_tpu.hessian.updates import update_hessian


class BlockWindow(NamedTuple):
    s_win: jnp.ndarray    # (W, D)
    y_win: jnp.ndarray    # (W, D)
    count: jnp.ndarray    # int32 total pairs pushed


def block_window_init(dim, window=8, dtype=jnp.float64):
    return BlockWindow(
        s_win=jnp.zeros((window, dim), dtype),
        y_win=jnp.zeros((window, dim), dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def block_window_push(win, s, y):
    w = win.s_win.shape[0]
    slot = win.count % w
    return BlockWindow(
        s_win=win.s_win.at[slot].set(s),
        y_win=win.y_win.at[slot].set(y),
        count=win.count + 1,
    )


def _masked_sy(win):
    w = win.s_win.shape[0]
    n_valid = jnp.minimum(win.count, w)
    mask = (jnp.arange(w) < n_valid).astype(win.s_win.dtype)
    s = win.s_win * mask[:, None]   # zero rows for unused slots
    y = win.y_win * mask[:, None]
    return s.T, y.T, mask  # (D, W)


def _reg_solve(a, b, eps=1e-10):
    """Solve a x = b with Tikhonov regularisation scaled to a's magnitude."""
    w = a.shape[0]
    scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
    from multioptpy_tpu.ops.eigh64 import solve_f64safe
    return solve_f64safe(a + eps * scale * jnp.eye(w, dtype=a.dtype), b)


def block_bfgs_delta(h, win):
    s, y, mask = _masked_sy(win)  # (D, W)
    yts = y.T @ s
    yts = 0.5 * (yts + yts.T)     # symmetrized multisecant condition
    hs = h @ s
    shs = s.T @ hs
    t1 = y @ _reg_solve(yts, y.T)
    t2 = hs @ _reg_solve(shs, hs.T)
    return t1 - t2


def block_sr1_delta(h, win):
    s, y, mask = _masked_sy(win)
    r = y - h @ s
    rts = r.T @ s
    rts = 0.5 * (rts + rts.T)
    return r @ _reg_solve(rts, r.T)


def block_psb_delta(h, win):
    s, y, mask = _masked_sy(win)
    r = y - h @ s
    sts = s.T @ s
    v = s @ _reg_solve(sts, jnp.eye(sts.shape[0], dtype=s.dtype))
    rv = r @ v.T
    return rv + rv.T - v @ (r.T @ s) @ v.T


def _phi2_aggregate(h, win, cfd=False):
    """Aggregated Bofill constant over the flattened window."""
    s, y, mask = _masked_sy(win)
    fac = 2.0 if cfd else 1.0
    r = (fac * (y - h @ s)).reshape(-1)
    sf = s.reshape(-1)
    num = jnp.dot(r, sf) ** 2
    den = jnp.dot(r, r) * jnp.dot(sf, sf)
    phi2 = jnp.where(den > 1e-30, num / jnp.maximum(den, 1e-30), 0.0)
    return jnp.clip(phi2, 0.0, 1.0)


def _phi2_per_pair_mean(h, win, cfd=False):
    """Mean of the PER-PAIR Bofill constants over the valid window — the
    reference's 'weighted' block flavor (ref:
    block_hessian_update.py:190 _get_individual_weights + :319-439)."""
    s, y, mask = _masked_sy(win)                      # (D, W)
    fac = 2.0 if cfd else 1.0
    r = fac * (y - h @ s)
    num = jnp.sum(r * s, axis=0) ** 2                 # (W,)
    den = jnp.sum(r * r, axis=0) * jnp.sum(s * s, axis=0)
    phi2 = jnp.where((mask > 0) & (den > 1e-30),
                     num / jnp.maximum(den, 1e-30), 0.0)
    phi2 = jnp.clip(phi2, 0.0, 1.0)
    return jnp.sum(phi2) / jnp.maximum(jnp.sum(mask), 1.0)


def block_fsb_delta(h, win, cfd=False, weighted=False):
    """phi-mixed block SR1/BFGS; phi = sqrt of the aggregated Bofill
    constant (plain) or of the per-pair mean ('weighted'); cfd doubles the
    residual in the weight (ref: block_hessian_update.py:240-319)."""
    phi2 = (_phi2_per_pair_mean(h, win, cfd) if weighted
            else _phi2_aggregate(h, win, cfd))
    phi = jnp.sqrt(phi2)
    return (1.0 - phi) * block_bfgs_delta(h, win) + phi * block_sr1_delta(h, win)


def block_bofill_delta(h, win, cfd=False, weighted=False):
    phi2 = (_phi2_per_pair_mean(h, win, cfd) if weighted
            else _phi2_aggregate(h, win, cfd))
    return (1.0 - phi2) * block_psb_delta(h, win) + phi2 * block_sr1_delta(h, win)


from functools import partial as _partial

_BLOCK_RULES = {
    "block_bfgs": block_bfgs_delta,
    "block_sr1": block_sr1_delta,
    "block_psb": block_psb_delta,
    "block_fsb": block_fsb_delta,
    "block_cfd_fsb": _partial(block_fsb_delta, cfd=True),
    "block_fsb_weighted": _partial(block_fsb_delta, weighted=True),
    "block_cfd_fsb_weighted": _partial(block_fsb_delta, cfd=True,
                                       weighted=True),
    "block_bofill": block_bofill_delta,
    "block_cfd_bofill": _partial(block_bofill_delta, cfd=True),
    "block_bofill_weighted": _partial(block_bofill_delta, weighted=True),
    "block_cfd_bofill_weighted": _partial(block_bofill_delta, cfd=True,
                                          weighted=True),
}


def block_update_hessian(h, win, s, y, method="block_fsb"):
    """Push (s, y) and apply the block rule; falls back to the rank-2 rule
    while the window holds < 2 pairs. `_dd` suffix = double-damp the pair
    before pushing (ref: block_hessian_update.py:619). Returns
    (h_new, win_new)."""
    if method.endswith("_dd") and method not in _BLOCK_RULES:
        from multioptpy_tpu.hessian.updates import double_damping
        y = double_damping(s, y)
        method = method[: -len("_dd")]
    win = block_window_push(win, s, y)
    rule = _BLOCK_RULES[method]
    h_block = h + rule(h, win)
    h_block = 0.5 * (h_block + h_block.T)
    # rank-2 warm-up fallback: strip block/weighted decorations
    rank2 = method.replace("block_", "").replace("_weighted", "")
    h_rank2 = update_hessian(h, s, y, rank2)
    use_block = win.count >= 2
    h_new = jnp.where(use_block & jnp.all(jnp.isfinite(h_block)),
                      h_block, h_rank2)
    return h_new, win
