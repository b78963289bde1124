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
    (ref: PESAnalyzer PCAPathAnalysis)."""
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
    (ref: PESAnalyzer KoopmanAnalyzer)."""
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
