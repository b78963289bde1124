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
    return jnp.linalg.solve(a + eps * scale * jnp.eye(w, dtype=a.dtype), b)


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


def block_fsb_delta(h, win):
    """sqrt(phi)-mixed SR1/BFGS using the aggregated Bofill constant."""
    s, y, mask = _masked_sy(win)
    r = (y - h @ s).reshape(-1)
    sf = s.reshape(-1)
    num = jnp.dot(r, sf) ** 2
    den = jnp.dot(r, r) * jnp.dot(sf, sf)
    phi2 = jnp.where(den > 1e-30, num / jnp.maximum(den, 1e-30), 0.0)
    phi = jnp.sqrt(jnp.clip(phi2, 0.0, 1.0))
    return (1.0 - phi) * block_bfgs_delta(h, win) + phi * block_sr1_delta(h, win)


def block_bofill_delta(h, win):
    s, y, mask = _masked_sy(win)
    r = (y - h @ s).reshape(-1)
    sf = s.reshape(-1)
    num = jnp.dot(r, sf) ** 2
    den = jnp.dot(r, r) * jnp.dot(sf, sf)
    phi2 = jnp.where(den > 1e-30, num / jnp.maximum(den, 1e-30), 0.0)
    phi2 = jnp.clip(phi2, 0.0, 1.0)
    return (1.0 - phi2) * block_psb_delta(h, win) + phi2 * block_sr1_delta(h, win)


_BLOCK_RULES = {
    "block_bfgs": block_bfgs_delta,
    "block_sr1": block_sr1_delta,
    "block_psb": block_psb_delta,
    "block_fsb": block_fsb_delta,
    "block_bofill": block_bofill_delta,
}


def block_update_hessian(h, win, s, y, method="block_fsb"):
    """Push (s, y) and apply the block rule; falls back to the rank-2 rule
    while the window holds < 2 pairs. Returns (h_new, win_new)."""
    win = block_window_push(win, s, y)
    rule = _BLOCK_RULES[method]
    h_block = h + rule(h, win)
    h_block = 0.5 * (h_block + h_block.T)
    h_rank2 = update_hessian(h, s, y, method.replace("block_", ""))
    use_block = win.count >= 2
    h_new = jnp.where(use_block & jnp.all(jnp.isfinite(h_block)),
                      h_block, h_rank2)
    return h_new, win
