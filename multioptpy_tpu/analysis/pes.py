"""Optimization-path embeddings & convergence analysis.

ref: multioptpy/PESAnalyzer/: CMDSPathAnalysis (classical multidimensional
scaling of the trajectory), PCAPathAnalysis, KoopmanAnalyzer (DMD-style
convergence analysis), calc_irc_curvature.
"""

from typing import NamedTuple

import numpy as np


class Embedding(NamedTuple):
    coords_2d: np.ndarray      # (S, 2)
    explained: np.ndarray      # variance ratios


def cmds_path_analysis(trajectory):
    """Classical MDS of pairwise frame RMSD -> 2-D path embedding
    (ref: PESAnalyzer/cmds_analysis.py)."""
    frames = np.asarray(trajectory).reshape(len(trajectory), -1)
    s = len(frames)
    d2 = np.sum((frames[:, None] - frames[None, :]) ** 2, axis=-1) / frames.shape[1]
    j = np.eye(s) - np.ones((s, s)) / s
    b = -0.5 * j @ d2 @ j
    w, v = np.linalg.eigh(b)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    w_pos = np.maximum(w[:2], 0.0)
    coords = v[:, :2] * np.sqrt(w_pos)[None, :]
    total = np.sum(np.maximum(w, 0.0)) + 1e-30
    return Embedding(coords_2d=coords, explained=w_pos / total)


def pca_path_analysis(trajectory):
    """PCA of the trajectory displacement covariance
    (ref: PESAnalyzer/pca_analysis.py PCAPathAnalysis)."""
    frames = np.asarray(trajectory).reshape(len(trajectory), -1)
    centered = frames - frames.mean(axis=0)
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    coords = u[:, :2] * s[:2]
    explained = s ** 2 / (np.sum(s ** 2) + 1e-30)
    return Embedding(coords_2d=coords, explained=explained[:2])


class KoopmanResult(NamedTuple):
    eigenvalues: np.ndarray
    decay_rates: np.ndarray
    converging: bool


def koopman_convergence_analysis(series):
    """DMD/Koopman spectrum of a convergence time series (gradient norms,
    energies) — eigenvalues inside the unit circle mean contraction
    (ref: PESAnalyzer/koopman_analysis.py KoopmanAnalyzer)."""
    x = np.asarray(series, dtype=np.float64)
    if x.ndim == 1:
        # delay-embed a scalar series
        d = 4
        if len(x) <= d + 1:
            return KoopmanResult(np.array([]), np.array([]), True)
        x = np.stack([x[i:len(x) - d + i] for i in range(d)], axis=1)
    x0, x1 = x[:-1].T, x[1:].T  # (d, S-1)
    a = x1 @ np.linalg.pinv(x0)
    w = np.linalg.eigvals(a)
    rates = -np.log(np.maximum(np.abs(w), 1e-12))
    return KoopmanResult(eigenvalues=w, decay_rates=rates,
                         converging=bool(np.all(np.abs(w) < 1.0 + 1e-9)))


def irc_curvature_properties(grad_mw, prev_grad_mw, hessian_mw, step_size):
    """Per-point IRC curvature properties, exactly the quantities the
    reference computes each euler/rk4 IRC step (ref: PESAnalyzer/
    calc_irc_curvature.py:80-104, invoked at IRC/euler.py:411 and
    IRC/rk4.py:544):

      unit tangent        t = g/|g| (mass-weighted gradient direction)
      curvature vector    k = (g - g_prev)/ds
      scalar curvature    |k|
      curvature coupling  projections of k onto the POSITIVE-eigenvalue
                          normal modes of the mass-weighted Hessian
                          (eigval > 1e-8, ref :73-76) — the Miller-type
                          coupling of path bending into bath modes

    Returns (unit_tangent, curvature_vector, scalar_curvature,
    curvature_coupling)."""
    g = np.asarray(grad_mw, dtype=np.float64).ravel()
    gp = np.asarray(prev_grad_mw, dtype=np.float64).ravel()
    tangent = g / (np.linalg.norm(g) + 1e-300)
    curv = (g - gp) / float(step_size)
    scalar = float(np.linalg.norm(curv))
    w, v = np.linalg.eigh(np.asarray(hessian_mw, dtype=np.float64))
    coupling = v[:, w > 1e-8].T @ curv
    return tangent, curv, scalar, coupling


def irc_branch_curvature_table(grads, masses, hessian, step_size):
    """Curvature-properties table for one IRC branch: rows of
    (scalar_curvature, coupling...) for steps 1..S-1, from the branch's
    per-step Cartesian gradients, the atomic masses, and the (Cartesian)
    TS Hessian. Mass-weighting matches the reference's convention
    (g_mw = g/sqrt(m), H_mw = M^-1/2 H M^-1/2; ref: IRC/euler.py:178,327).
    Feed `IRCResult.forward_gradients` / `.backward_gradients`."""
    g = np.asarray(grads, dtype=np.float64)
    s = g.shape[0]
    sm = np.repeat(np.sqrt(np.asarray(masses, dtype=np.float64)), 3)
    g_mw = g.reshape(s, -1) / sm[None, :]
    h_mw = np.asarray(hessian, dtype=np.float64) / sm[:, None] / sm[None, :]
    rows = []
    for i in range(1, s):
        _, _, scalar, coupling = irc_curvature_properties(
            g_mw[i], g_mw[i - 1], h_mw, step_size)
        rows.append(np.concatenate([[scalar], coupling]))
    return np.asarray(rows)


def path_bending_angles(mw_path):
    """Bending angle (degrees) at each interior point of a mass-weighted
    path: the angle between the backward and forward displacement vectors
    (ref: IRC/euler.py:367-373 via Utils/calc_tools.py
    calc_multi_dim_vec_angle — printed per step as 'Path bending angle')."""
    p = np.asarray(mw_path, dtype=np.float64).reshape(len(mw_path), -1)
    angles = []
    for i in range(1, len(p) - 1):
        u = p[i - 1] - p[i]
        v = p[i + 1] - p[i]
        denom = np.linalg.norm(u) * np.linalg.norm(v)
        if denom < 1e-300:
            angles.append(0.0)
            continue
        c = np.clip(np.dot(u, v) / denom, -1.0, 1.0)
        angles.append(float(np.degrees(np.arccos(c))))
    return np.asarray(angles)


def irc_curvature(path):
    """Discrete curvature along an IRC path (ref: PESAnalyzer/
    calc_irc_curvature.py): |x''(s)| with central differences on the
    arc-length-parametrized path."""
    p = np.asarray(path).reshape(len(path), -1)
    seg = np.linalg.norm(np.diff(p, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    curv = np.zeros(len(p))
    for i in range(1, len(p) - 1):
        h1, h2 = s[i] - s[i - 1], s[i + 1] - s[i]
        if h1 < 1e-12 or h2 < 1e-12:
            continue
        d2 = 2.0 * (h1 * p[i + 1] - (h1 + h2) * p[i] + h2 * p[i - 1]) / (
            h1 * h2 * (h1 + h2))
        curv[i] = np.linalg.norm(d2)
    return curv
